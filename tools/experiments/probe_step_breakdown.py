"""Probe: sectional timing of the bench pretrain step on the real chip.

Measures at bench shapes (BENCH_BS, default 2): model fwd (eval mode),
fwd+grad, full train step — so each round's optimization targets the
current biggest slice, not a stale one. Optionally dumps a profiler trace
(PROBE_TRACE=/tmp/trace) for op-level attribution.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench as B


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ponderv2_tpu.engines.train import TrainState, make_train_step
    from ponderv2_tpu.models import build_model
    from ponderv2_tpu.utils.optimizer import build_optimizer
    from ponderv2_tpu.utils.scheduler import build_scheduler

    batch_size = int(os.environ.get("BENCH_BS", "2"))
    arrays = B.build_workload(
        batch_size, int(os.environ.get("BENCH_POINTS", "100000")))
    static_ctx = dict(spatial_shape=(544, 544, 192), batch_size=batch_size)
    model = build_model(B.build_model_cfg())

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, a: model.init(r, {**a, **static_ctx, "rng": r}, train=False)
    )(rng, arrays)
    schedule = build_scheduler(dict(type="OneCycleLR", max_lr=0.0005), 1000)
    tx = build_optimizer(
        dict(type="SGD", lr=0.0005, momentum=0.9, weight_decay=0.0001),
        variables["params"], schedule,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        constants=variables.get("constants", {}),
    )

    def loss_fwd(params, a):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {}),
             "constants": variables.get("constants", {})},
            {**a, **static_ctx, "rng": rng}, train=True,
            mutable=["batch_stats"])
        out = out[0]
        loss = out["loss"] if isinstance(out, dict) else out
        return jnp.asarray(loss, jnp.float32)

    what = os.environ.get("PROBE_WHAT", "step")

    def timeit_scalar(c, *args, iters=6):
        # value-fetch a scalar each call (tunnel: block_until_ready lies)
        out = c(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = c(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        return (time.perf_counter() - t0) / iters * 1e3

    if what in ("backbone", "render"):
        # sectional timings through module methods: backbone = sparse UNet
        # fwd (and fwd+vjp); render = everything after the backbone
        # (unit-cube, volume scatter, UNet3D proj, ray pick, NeuS render,
        # losses) from a FIXED sparse_feat input.
        from ponderv2_tpu.models.default import batch_to_sparse_tensor
        from ponderv2_tpu.ops.sparse import sort_by_key

        vars_all = {"params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                    "constants": variables.get("constants", {})}

        def backbone_fn(params, a):
            def m(mdl, inp):
                st = batch_to_sparse_tensor(inp)
                st_s, inv = sort_by_key(st)
                return mdl.backbone_net(st_s, train=True)[inv]

            out, _ = model.apply(
                {**vars_all, "params": params}, {**a, **static_ctx},
                method=m, mutable=["batch_stats"])
            return out

        def render_fn(params, feat, a):
            def m(mdl, sparse_feat, inp):
                coord = inp["coord"].astype(jnp.float32)
                b = inp["batch"]
                B = int(inp["batch_size"])
                loc, scale, z_shift = mdl._unit_cube_params(coord, b, B)
                p_norm = mdl._normalize_points(coord, b, loc, scale, z_shift)
                volume = mdl._build_volume(sparse_feat, p_norm, b, B)
                volume = mdl.proj_net(volume, train=True)
                ray_dict = mdl._sample_rays(
                    inp, loc, scale, z_shift, inp["rng"], True)
                pad = 1.0 + mdl.padding
                ray_o = (ray_dict["ray_o"] / pad) + 0.5
                out = mdl.render_model(volume, ray_o, ray_dict["ray_d"],
                                       train=True, rng=inp["rng"])
                emb = (mdl.class_embedding.value
                       if hasattr(mdl, "class_embedding") else None)
                losses = mdl.render_model.get_loss(out, ray_dict, emb)
                return losses["render_loss"]

            out, _ = model.apply(
                {**vars_all, "params": params}, feat,
                {**a, **static_ctx, "rng": rng},
                method=m, mutable=["batch_stats"])
            return out

        if what == "backbone":
            c = jax.jit(
                lambda p, a: jnp.sum(backbone_fn(p, a))
            ).lower(variables["params"], arrays).compile()
            print("backbone fwd    %7.1f ms"
                  % timeit_scalar(c, variables["params"], arrays))
            cg = jax.jit(
                jax.grad(lambda p, a: jnp.sum(backbone_fn(p, a)))
            ).lower(variables["params"], arrays).compile()
            print("backbone f+g    %7.1f ms"
                  % timeit_scalar(cg, variables["params"], arrays))
        else:
            feat = jax.jit(backbone_fn)(variables["params"], arrays)
            feat = jax.block_until_ready(feat)
            c = jax.jit(render_fn).lower(
                variables["params"], feat, arrays).compile()
            print("render fwd      %7.1f ms"
                  % timeit_scalar(c, variables["params"], feat, arrays))
            cg = jax.jit(
                jax.grad(render_fn, argnums=(0, 1))
            ).lower(variables["params"], feat, arrays).compile()
            print("render f+g      %7.1f ms"
                  % timeit_scalar(cg, variables["params"], feat, arrays))
    elif what == "fwd":
        c = jax.jit(loss_fwd).lower(variables["params"], arrays).compile()
        print("model fwd       %7.1f ms"
              % timeit_scalar(c, variables["params"], arrays))
    elif what == "grad":
        c = jax.jit(jax.grad(loss_fwd)).lower(
            variables["params"], arrays).compile()
        print("model fwd+grad  %7.1f ms"
              % timeit_scalar(c, variables["params"], arrays))
    else:
        step_j = make_train_step(model, tx, schedule, static_ctx)
        c_step = step_j.lower(state, arrays).compile()

        # the step donates state buffers: THREAD the state through calls
        # (re-calling with the original donated state is INVALID_ARGUMENT)
        state, m = c_step(state, arrays)
        float(m["loss"])
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = c_step(state, arrays)
        float(m["loss"])
        print("train step      %7.1f ms"
              % ((time.perf_counter() - t0) / iters * 1e3))

        trace_dir = os.environ.get("PROBE_TRACE")
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                for _ in range(2):
                    state, m = c_step(state, arrays)
                float(m["loss"])
            print("trace written to", trace_dir)


if __name__ == "__main__":
    main()
