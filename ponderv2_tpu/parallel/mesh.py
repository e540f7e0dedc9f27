"""Device-mesh data parallelism: shard_map SPMD train steps.

The reference's only parallelism is DDP (NCCL allreduce on backward,
/root/reference/ponder/engines/defaults.py:22-43). The TPU-native equivalent:

- a ``jax.sharding.Mesh`` with a ``data`` axis over all chips;
- the train step wrapped in ``jax.shard_map``: every device runs the full model
  on its own scene shard (scenes never straddle devices — sparse conv never mixes
  batch elements, so per-device rulebooks are exact);
- gradients / loss / BN statistics are averaged with ``lax.pmean`` over ICI —
  the XLA collective replacing DDP's allreduce (and SyncBatchNorm);
- parameters and optimizer state are replicated.

Batches arrive with a leading device axis: ``(D, point_budget, ...)`` built by
``shard_collate`` (each slice an independently collated sub-batch).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise RuntimeError(
                f"create_mesh: requested {num_devices} devices but only "
                f"{len(devices)} available ({devices[:2]}...). Refusing to "
                f"silently build a smaller mesh — for a simulated mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={num_devices} "
                f"and force the cpu platform before jax initializes."
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_collate(
    scenes: Sequence[Dict[str, Any]],
    num_devices: int,
    point_budget: int,
    scenes_per_device: int,
    mix_prob: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Collate scenes into a (D, ...) stacked batch, one sub-batch per device."""
    from ..datasets.utils import sharded_collate_fn

    assert len(scenes) == num_devices * scenes_per_device
    out = sharded_collate_fn(
        scenes,
        num_devices,
        point_budget=point_budget * num_devices,
        mix_prob=mix_prob,
        scene_budget=scenes_per_device * num_devices,
    )
    return {k: v for k, v in out.items() if isinstance(v, np.ndarray)}


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    schedule: Callable,
    static_ctx: Dict[str, Any],
    mesh: Mesh,
    axis_name: str = "data",
    loss_key: str = "loss",
    metric_keys: Sequence[str] = (),
    rng_seed: int = 0,
    sync_bn: bool = False,
):
    """Data-parallel train step over ``mesh``: state replicated, batch sharded.

    ``sync_bn=True`` computes BatchNorm statistics across the whole mesh
    (reference cfg.sync_bn -> nn.SyncBatchNorm, train.py:207-208); off by
    default, matching the reference default."""

    base_rng = jax.random.PRNGKey(rng_seed)

    def per_device_step(state, arrays):
        # arrays arrive as the local shard with a leading length-1 device axis
        arrays = {k: v[0] for k, v in arrays.items()}
        # distinct RNG stream per device and step
        rng = jax.random.fold_in(
            jax.random.fold_in(base_rng, state.step), jax.lax.axis_index(axis_name)
        )
        input_dict = {**arrays, **static_ctx, "rng": rng}

        def loss_fn(params):
            from ..models.norm import bn_sync_axis

            variables = {"params": params, "batch_stats": state.batch_stats}
            if state.constants:
                variables["constants"] = state.constants
            with bn_sync_axis(axis_name if sync_bn else None):
                out, mutated = model.apply(
                    variables, input_dict, train=True,
                    mutable=["batch_stats", "diagnostics"],
                )
            return out[loss_key], (
                out, mutated["batch_stats"], mutated.get("diagnostics", {})
            )

        (loss, (out, batch_stats, diags)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # DDP-equivalent gradient allreduce + stat sync, riding ICI
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        batch_stats = jax.lax.pmean(batch_stats, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        metrics = {"loss": loss, "lr": schedule(state.step)}
        flags = jax.tree.leaves(diags)
        if flags:
            # min over devices: 1.0 iff every plan contract held everywhere
            metrics["contract_ok"] = jax.lax.pmin(
                jnp.all(jnp.stack(flags)).astype(jnp.float32), axis_name
            )
        for k in metric_keys:
            if k in out:
                metrics[k] = jax.lax.pmean(out[k], axis_name)
        return new_state, metrics

    sharded = jax.shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def replicate_state(state, mesh: Mesh):
    """Place the train state replicated across the mesh.

    Multi-process meshes (jax.distributed) place via
    ``make_array_from_process_local_data`` — every process holds the full
    value, so the local data IS the global value."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(state, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        state,
    )


def shard_batch(arrays: Dict[str, np.ndarray], mesh: Mesh, axis_name: str = "data"):
    """Place a batch sharded on its leading (device) axis.

    Single-process: arrays are (D_global, ...) and device_put scatters them.
    Multi-process: each process passes its LOCAL shard (D_local, ...) and the
    global array is assembled across processes (process order = device order
    along the mesh axis)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return {
            k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in arrays.items()
        }
    n_global = mesh.devices.size
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        global_shape = (n_global,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape
        )
    return out
