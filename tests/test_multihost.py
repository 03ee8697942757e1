"""Multi-HOST training over the JAX distributed runtime.

Two real OS processes x 4 virtual CPU devices each (8 global, gloo
collectives) run the tiny-LVTR train step on rank-local halves of a
deterministic global batch; metrics must agree with each other AND
with the single-process 8-device run of the full batch — validating
``parallel/mesh.py::init_distributed`` + the
``make_array_from_process_local_data`` batch path end-to-end.  This is
the DDP-rank equivalent the reference gets from Lightning/NCCL
(``/root/reference/scripts/train.py:93-95``), one level beyond the
single-process virtual mesh used elsewhere in the suite.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from vae_gslm_tpu.hparams.hp import Hparams

from tests.test_fsdp import TRAIN_HP, _batch, vocoder_dir  # noqa: F401

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@requires_8
def test_two_process_train_step_matches_single_process(
        vocoder_dir, tmp_path):
    # 2-process run LAUNCHED FIRST: their ~25 s/process import +
    # trainer-construction phase overlaps the in-process baseline
    # below on a multi-core host (and costs nothing extra on one
    # core, where the scheduler interleaves the same total work).
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("XLA_", "VAE_GSLM_", "JAX_"))}
    # the session compile cache (conftest) is same-host by
    # construction — let the ranks reuse it instead of cold-compiling
    # the identical global program twice per run
    for k in ("JAX_COMPILATION_CACHE_DIR",
              "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
        if k in os.environ:
            env_base[k] = os.environ[k]
    procs = []
    for rank in (0, 1):
        env = dict(env_base,
                   VAE_GSLM_COORDINATOR=f"127.0.0.1:{port}",
                   VAE_GSLM_NUM_PROCESSES="2",
                   VAE_GSLM_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(vocoder_dir), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))

    # Baseline: single process, 8 virtual devices, full global batch.
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    hp = Hparams.from_yaml(TRAIN_HP.format(
        fsdp="false", log_dir=tmp_path / "base",
        vocoder_dir=vocoder_dir))
    base = LVTRTrainer(hp)
    base_metrics = []
    for seed in (0, 1):
        base_metrics.append(
            {k: float(v) for k, v in base.run_step(_batch(seed=seed)
                                                   ).items()})
        base.global_step += 1

    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append([json.loads(line.split(" ", 1)[1])
                     for line in out.splitlines()
                     if line.startswith("METRICS ")])
    assert len(outs[0]) == len(outs[1]) == 2

    for step in range(2):
        for k, v in base_metrics[step].items():
            # both ranks see the same replicated metrics...
            np.testing.assert_allclose(
                outs[0][step][k], outs[1][step][k], rtol=1e-6,
                err_msg=f"step {step} metric {k} differs across ranks")
            # ...matching the single-process global-batch result
            # (gloo vs in-process collectives: reduction-order noise)
            np.testing.assert_allclose(
                outs[0][step][k], v, rtol=5e-4, atol=1e-5,
                err_msg=f"step {step} metric {k} != single-process")
