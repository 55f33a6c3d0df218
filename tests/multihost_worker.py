"""Worker for the multi-host bring-up test (run as a subprocess, one per
fake host): 2 processes x 4 virtual CPU devices coordinate through
jax.distributed via engine.launch, build ONE global (data=4, model=2) mesh
spanning both processes, and run a real tensor-parallel VT train step.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lvt_tpu.config import get_cfg
    from lvt_tpu.engine.trainer import TrainState, make_train_step
    from lvt_tpu.models.vt import VideoTransformer
    from lvt_tpu.parallel.mesh import build_mesh
    from lvt_tpu.parallel.sharding import tp_shardings
    from lvt_tpu.solver import build_optimizer

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    mesh = build_mesh(data=4, model=2)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 4, 64
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 64, 32, 32
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
    cfg.SOLVER.RMSPROP.ALPHA_G = 0.95
    cfg.SOLVER.RMSPROP.MOMENTUM_G = 0.9

    model = VideoTransformer(cfg, T=8, H=4, W=4)
    optimizer = build_optimizer(cfg)
    rep = NamedSharding(mesh, P())

    # init INSIDE jit with explicit out_shardings: arrays are born global,
    # no host->global transfers needed on any process
    params, mstate = jax.jit(model.init, out_shardings=rep)(jax.random.key(0))
    params = jax.jit(lambda p: p, out_shardings=tp_shardings(mesh, params))(params)
    opt_state = jax.jit(optimizer.init,
                        out_shardings=tp_shardings(
                            mesh, jax.eval_shape(optimizer.init, params)))(params)

    state = TrainState(params=params, model_state=mstate, opt_state=opt_state,
                       accum_grads=None,
                       step=jax.jit(lambda: jnp.zeros((), jnp.int32),
                                    out_shardings=rep)())

    # batch: process-local shards assembled into one global array
    batch_sharding = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    global_video = rng.integers(0, 64, size=(8, 4, 8, 4, 4)).astype(np.int32)
    video = jax.make_array_from_callback(
        global_video.shape, batch_sharding,
        lambda idx: global_video[idx])

    key = jax.jit(lambda: jax.random.key(1), out_shardings=rep)()
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
    state, metrics = step(state, {"video": video}, key)
    loss = float(metrics["loss_cross_entropy"])
    assert np.isfinite(loss), loss

    # checkpoint save in the 2-process world (VERDICT r4 #3c): EVERY
    # process enters save_checkpoint — Orbax's save of non-fully-addressable
    # mesh-sharded arrays is a collective (the PeriodicCheckpointer
    # coordination story, engine/hooks.py); restore with explicit target
    # shardings round-trips bit-exactly on both processes
    ckpt_dir = os.environ.get("LVT_MH_CKPT_DIR")
    if ckpt_dir:
        from lvt_tpu.checkpoint import (latest_checkpoint, load_checkpoint,
                                        save_checkpoint)

        tree = {"params": state.params, "step": state.step}
        save_checkpoint(ckpt_dir, 1, tree)
        target = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
            out_shardings=jax.tree_util.tree_map(lambda l: l.sharding, tree),
        )(tree)
        restored = load_checkpoint(latest_checkpoint(ckpt_dir), target)
        ok = jax.jit(
            lambda a, b: jnp.all(jnp.asarray(
                [jnp.array_equal(x, y) for x, y in zip(
                    jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b))])),
            out_shardings=NamedSharding(mesh, P()),
        )(restored["params"], state.params)
        assert bool(ok), "multihost checkpoint round-trip mismatch"
        wq = restored["params"]["netG"]["encoder"]["layers"][0].wq
        assert wq.sharding.spec == P("model"), wq.sharding
        print(f"multihost proc {jax.process_index()}: ckpt save/restore OK",
              flush=True)

    # object all_gather with RAGGED per-process payloads — the path the
    # evaluators' cross-rank feature/metric gathers use (comm.py pickles +
    # pads; bare process_allgather cannot do ragged objects)
    from lvt_tpu.utils import comm
    payload = [{"rank": jax.process_index(),
                "feats": np.arange(3 + jax.process_index())}]
    gathered = comm.all_gather(payload)
    assert [g[0]["rank"] for g in gathered] == [0, 1], gathered
    assert gathered[0][0]["feats"].shape == (3,)
    assert gathered[1][0]["feats"].shape == (4,)

    print(f"multihost proc {jax.process_index()}/{jax.process_count()}: "
          f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"loss={loss:.4f} OK", flush=True)


if __name__ == "__main__":
    from lvt_tpu.engine.launch import launch

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    launch(main, multihost=True,
           coordinator_address=f"127.0.0.1:{port}",
           num_processes=nproc, process_id=pid)
