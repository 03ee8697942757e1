"""Worker for the 2-process multi-host integration test.

Each process owns 4 virtual CPU devices (8 global), initializes the
JAX distributed runtime with gloo collectives, builds the SAME tiny
LVTR trainer as ``tests/test_fsdp.py``, and feeds its HALF of a
deterministic global batch through two real train steps — the
cross-process gradient all-reduce runs inside the jitted step.  Prints
one JSON metrics line per step for the parent to compare against the
single-process 8-device run.

Usage (env: VAE_GSLM_COORDINATOR, VAE_GSLM_NUM_PROCESSES,
VAE_GSLM_PROCESS_ID):  python multihost_worker.py <vocoder_dir> <tmp>
"""
import json
import os
import sys

os.environ["VAE_GSLM_FORCE_CPU"] = "1"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("VAE_GSLM_NO_COMPILE_CACHE", "1")


# NOTE (round 5): a rank-0 ``.lower().compile()`` + sentinel scheme to
# dedup the two ranks' identical step compiles was tried and REVERTED:
# explicit AOT compilation on XLA:CPU targets different machine
# features (+prefer-no-gather) than the JIT path, and the persistent-
# cache entry it writes crashes the peer's load ON THE SAME HOST
# (cpu_aot_loader "machine feature not supported").  Both ranks
# compiling concurrently is the safe behavior; the persistent cache
# still dedups across RUNS.

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    voc_dir, tmp = sys.argv[1], sys.argv[2]
    from vae_gslm_tpu.parallel import mesh as mesh_lib

    assert mesh_lib.init_distributed()
    import jax

    rank = jax.process_index()
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    from vae_gslm_tpu.hparams.hp import Hparams
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    from tests.test_fsdp import TRAIN_HP, _batch

    hp = Hparams.from_yaml(TRAIN_HP.format(
        fsdp="false", log_dir=os.path.join(tmp, f"rank{rank}"),
        vocoder_dir=voc_dir))
    hp.trainer.distributed = True
    trainer = LVTRTrainer(hp)
    assert trainer.mesh.devices.size == 8
    assert trainer._is_main == (rank == 0)

    for step, seed in enumerate((0, 1)):
        full = _batch(seed=seed)              # identical on both ranks
        local = jax.tree_util.tree_map(
            lambda x: x[:, rank * 8:(rank + 1) * 8], full)
        metrics = trainer.run_step(local)
        trainer.global_step += 1
        print("METRICS " + json.dumps(
            {k: float(v) for k, v in metrics.items()}), flush=True)


if __name__ == "__main__":
    main()
