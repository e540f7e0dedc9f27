"""Multi-process launch: 2-process CPU jax.distributed harness.

Validates the path the reference exercises with mp.spawn + NCCL
(launch.py:38-241) on real clusters: ``engines.launch.launch`` initializes
jax.distributed from env vars (coordinator + SLURM-style rank/ntasks), a
global mesh spans both processes, and the sharded train step runs with
per-process local batch shards — losses and updated parameters must agree
bit-for-bit across processes (the DDP-equivalence guarantee).

Runs as a subprocess harness (two fresh Python processes) because
jax.distributed can only be initialized once per process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import os, sys

# platform setup must precede jax import; 2 local devices per process
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["PONDER_PLATFORM"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.environ["PONDER_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from ponderv2_tpu.engines.launch import launch


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4
    rank = jax.process_index()

    import jax.numpy as jnp
    from ponderv2_tpu.engines.train import TrainState
    from ponderv2_tpu.models import build_model
    from ponderv2_tpu.parallel.mesh import (
        create_mesh, make_sharded_train_step, replicate_state, shard_batch,
    )
    from ponderv2_tpu.utils.optimizer import build_optimizer
    from ponderv2_tpu.utils.scheduler import build_scheduler

    model = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(type="SpUNet-v1m1", in_channels=3, num_classes=4,
                      base_channels=4, channels=(4, 4, 4, 4),
                      layers=(1, 1, 1, 1)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    static_ctx = dict(spatial_shape=(8, 8, 8), batch_size=1)

    def local_batch(shard_ids):
        # deterministic per-GLOBAL-shard batches: every process derives the
        # same global dataset, takes its own slice
        arrs = []
        for s in shard_ids:
            rng = np.random.RandomState(100 + s)
            n, cap = 30, 40
            coords = np.stack([
                np.zeros(n, np.int64), rng.randint(0, 8, n),
                rng.randint(0, 8, n), rng.randint(0, 8, n)], 1)
            coords = np.unique(coords, axis=0)
            m = len(coords)
            coords = np.concatenate(
                [coords, np.full((cap - m, 4), -1)]).astype(np.int32)
            arrs.append(dict(
                feat=np.concatenate([rng.randn(m, 3).astype(np.float32),
                                     np.zeros((cap - m, 3), np.float32)]),
                grid_coord=coords[:, 1:], batch=coords[:, 0],
                segment=np.concatenate(
                    [rng.randint(0, 4, m),
                     np.full(cap - m, -1)]).astype(np.int32),
            ))
        return {
            k: np.stack([a[k] for a in arrs]) for k in arrs[0]
        }

    mesh = create_mesh(4)
    variables = model.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v[0]) for k, v in local_batch([0]).items()}
        | static_ctx,
        train=False,
    )
    schedule = build_scheduler(dict(type="MultiStepLR", milestones=[0.5],
                                    gamma=0.1, base_lr=0.1), 20)
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9,
                              weight_decay=0.0), variables["params"], schedule)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        constants=variables.get("constants", {}),
    )
    state = replicate_state(state, mesh)
    step = make_sharded_train_step(model, tx, schedule, static_ctx, mesh,
                                   sync_bn=True)
    # global shards 0..3; this process feeds its local two
    my_shards = [rank * 2, rank * 2 + 1]
    arrays = shard_batch(local_batch(my_shards), mesh)
    state, metrics = step(state, arrays)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    # parameter checksum must agree across processes (grad pmean synced)
    local_params = jax.tree.map(
        lambda x: np.asarray(
            jax.device_get(x.addressable_data(0))
        ), state.params)
    checksum = float(sum(np.abs(p).sum() for p in
                         jax.tree.leaves(local_params)))
    print(f"RESULT rank={rank} loss={loss:.8f} checksum={checksum:.6f}",
          flush=True)


launch(main)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("PYTHONPATH", None)
        env.update(
            PONDER_REPO=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            SLURM_NTASKS="2",
            SLURM_PROCID=str(rank),
            SLURM_JOB_NUM_NODES="2",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    results = {}
    for rank, out in enumerate(outs):
        assert procs[rank].returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-4000:]
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        results[rank] = (float(parts["loss"]), float(parts["checksum"]))
    # pmean-synced: loss and updated params identical across processes
    assert results[0][0] == results[1][0]
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)
