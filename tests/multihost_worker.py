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
import time

os.environ["VAE_GSLM_FORCE_CPU"] = "1"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("VAE_GSLM_NO_COMPILE_CACHE", "1")


def _wait_for(path: str, cap_s: float = 90.0) -> None:
    """Bounded wait for rank 0's compile sentinel: both ranks compile
    the identical SPMD step program, so letting rank 0 finish first
    (``precompile_step`` — lower+compile only, no collective, hence no
    cross-rank deadlock) turns rank 1's compile into a persistent-
    cache load instead of a second full compile on the shared host
    CPU.  Proceeds after ``cap_s`` regardless."""
    deadline = time.time() + cap_s
    while time.time() < deadline and not os.path.exists(path):
        time.sleep(0.5)

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
    sentinel = os.path.join(tmp, "rank0_step_compiled")
    if rank == 0:
        first = jax.tree_util.tree_map(
            lambda x: x[:, :8], _batch(seed=0))
        trainer.precompile_step(first)
        with open(sentinel, "w"):
            pass
    else:
        _wait_for(sentinel)

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
