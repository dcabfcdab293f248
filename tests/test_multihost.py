"""Multi-host (multi-process) data-parallel training test.

Spawns two OS processes that form a global 8-device mesh via
``jax.distributed`` (Gloo on CPU emulating the DCN path, SURVEY.md §5.8) and
runs one CNN+BiLSTM train step with the batch sharded across processes --
verifying that gradient synchronization produces identical parameters on
every host.
"""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, json
    proc_id = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:12983", num_processes=2, process_id=proc_id
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ml_audio_inpainting_tpu.parallel.mesh import make_mesh, batch_sharding
    from ml_audio_inpainting_tpu.parallel.sharding import make_sharded_step, place_state
    from ml_audio_inpainting_tpu.train.cnn_trainer import create_cnn_state, make_cnn_train_step
    from ml_audio_inpainting_tpu.utils.config import Config, SpectrogramConfig

    cfg = Config()
    cfg.data.spectrogram = SpectrogramConfig(n_fft=512, hop_length=192, win_length=384)
    cfg.data.max_len_s = 1.0
    cfg.data.gap_len_s = 0.1
    cfg.model.cnn_blstm.lstm_hidden_dim = 32
    cfg.model.cnn_blstm.num_lstm_layers = 1
    cfg.model.cnn_blstm.enc_filters = [4, 8]
    cfg.model.cnn_blstm.dec_filters = [4, 8]

    mesh = make_mesh()  # 8 global devices (4 local x 2 processes)
    assert len(jax.devices()) == 8, len(jax.devices())
    state = create_cnn_state(cfg, jax.random.PRNGKey(0))
    step = make_sharded_step(make_cnn_train_step(cfg), state, mesh)
    state = place_state(state, mesh)

    # Each process contributes its local half of the global batch of 8.
    rng = np.random.default_rng(proc_id)
    local = rng.standard_normal((4, 16000)).astype(np.float32) * 0.1
    audio = jax.make_array_from_process_local_data(batch_sharding(mesh), local)

    state, metrics = step(state, audio, jax.random.PRNGKey(7))
    # Parameter checksum must be identical on every host after the psum.
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(jnp.sum(jnp.abs(l)).item() for l in leaves))
    print(json.dumps({"proc": proc_id, "loss": float(metrics["loss"]),
                      "checksum": checksum}), flush=True)
    """
)


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = Path(__file__).resolve().parent.parent
    # The worker imports the package by path: python adds the *script's*
    # directory to sys.path, not the cwd, so pass the repo root explicitly
    # (don't depend on an inherited PYTHONPATH).
    env = dict(os.environ)
    env["PYTHONPATH"] = str(repo_root) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=repo_root,
            env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err.decode()[-2000:]
        line = [l for l in out.decode().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"], rel=1e-6)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-5)
    assert np.isfinite(results[0]["loss"])
