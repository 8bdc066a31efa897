"""One process of the multi-process jax.distributed training drill.

The reference's process-group boundary is ``accelerate launch`` spawning
one torch-DDP process per GPU (reference run.sh:1, train.py:492-496). The
TPU-native equivalent is one JAX process per host with
``jax.distributed.initialize`` + GSPMD over the global device mesh — DCN
across hosts, ICI within. This drill executes that path for real on CPU:
the parent (tests/test_multihost.py or a manual run) spawns N of these
workers on localhost, each holding ``--local_devices`` virtual CPU
devices, and the DP(+FSDP) train step runs over the GLOBAL mesh with the
batch sharded across processes.

What each worker does:
  * ``parallel.distributed.initialize`` against the coordinator
    (the exact entry production multi-host uses; no-op path covered by
    the single-process control run),
  * builds the global ``(data, model)`` mesh over jax.devices() — which
    includes the OTHER process's non-addressable devices,
  * DP train step: replicated tiny-bundle state, batch sharded over
    ``data`` spanning both processes (grad psum crosses the process
    boundary),
  * FSDP train step: state/frozen sharded with the production
    ``fsdp.shard_tree`` rules over the same cross-process axis,
  * a REAL distributed orbax save of the sharded state (every process
    writes its shards; coordination over jax.distributed) + restore into
    the same shardings + max-abs-diff check,
  * process 0 writes the metrics JSON the parent compares against the
    single-process control run.

Run one process manually:
  python tools/multihost_worker.py --coordinator 127.0.0.1:9911 \
      --num_processes 2 --process_id 0 --local_devices 4 --out /tmp/p0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--ckpt_dir", default="", help="orbax save/restore drill dir (shared)")
    ap.add_argument("--out", default="", help="metrics JSON path (process 0 writes)")
    args = ap.parse_args(argv)

    # Must precede the first jax import; the parent usually sets these but
    # a manual run shouldn't silently grab the TPU tunnel.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        )

    import jax

    # the axon sitecustomize re-pins jax_platforms at interpreter start
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from imagharmony_tpu.parallel import distributed

    did_init = distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert did_init == (args.num_processes > 1)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == args.local_devices
    assert jax.device_count() == args.num_processes * args.local_devices
    assert distributed.is_main_process() == (args.process_id == 0)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagharmony_tpu import dtypes
    from imagharmony_tpu.parallel import fsdp as fsdp_lib
    from imagharmony_tpu.parallel import mesh as mesh_lib
    from imagharmony_tpu.pipelines import components as comp
    from imagharmony_tpu.train import step as step_lib

    # Global mesh over ALL devices, both processes' (jax.devices() orders
    # consistently across processes).
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == jax.device_count()

    cfgs = comp.tiny_configs()
    params = comp.init_params(0, cfgs)  # host numpy, deterministic per seed
    tcfg = step_lib.TrainConfig(learning_rate=1e-3, gradient_checkpoint=False)
    state, frozen = step_lib.init_state(params, tcfg)
    batch = step_lib.dummy_batch(cfgs, batch_size=args.batch_size)
    # each host would feed its local_batch_slice in production; here both
    # hosts hold the same deterministic batch, so the helper is exercised
    # by shape only
    sl = distributed.local_batch_slice(args.batch_size)
    assert (sl.stop - sl.start) * args.num_processes == args.batch_size

    key = np.asarray(jax.random.PRNGKey(1))
    record = {
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
    }
    step_fn = step_lib.make_train_step(cfgs, tcfg, policy=dtypes.FP32)

    with mesh:
        # ---- DP: replicated state, batch sharded across the processes ----
        state_r = mesh_lib.replicate(mesh, state)
        frozen_r = mesh_lib.replicate(mesh, frozen)
        batch_g = mesh_lib.shard_batch(mesh, batch)
        key_g = jax.device_put(key, mesh_lib.replicated(mesh))
        new_state, metrics = jax.jit(step_fn)(state_r, frozen_r, batch_g, key_g)
        record["dp_loss"] = float(metrics["loss"])
        record["dp_grad_norm"] = float(metrics["grad_norm"])
        del state_r, new_state

        # ---- FSDP/ZeRO-3: state sharded over the cross-process data axis --
        min_elems = 64  # tiny-config leaf sizes
        state_f = fsdp_lib.shard_tree(mesh, state, min_elems=min_elems)
        frozen_f = fsdp_lib.shard_tree(mesh, frozen, min_elems=min_elems)
        state_sh = fsdp_lib.tree_shardings(mesh, state, min_elems=min_elems)
        rep = NamedSharding(mesh, P())
        fsdp_step = jax.jit(
            step_fn, out_shardings=(state_sh, {"loss": rep, "grad_norm": rep})
        )
        state2, metrics_f = fsdp_step(state_f, frozen_f, batch_g, key_g)
        record["fsdp_loss"] = float(metrics_f["loss"])
        record["fsdp_grad_norm"] = float(metrics_f["grad_norm"])

        # ---- distributed orbax round-trip of the SHARDED state ----
        if args.ckpt_dir:
            import orbax.checkpoint as ocp

            mngr = ocp.CheckpointManager(args.ckpt_dir)
            mngr.save(1, args=ocp.args.StandardSave(state2))
            mngr.wait_until_finished()
            restored = mngr.restore(1, args=ocp.args.StandardRestore(state2))
            mngr.close()

            @jax.jit
            def maxdiff(a, b):
                ds = [
                    jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
                    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
                ]
                return jnp.max(jnp.stack(ds))

            record["restore_maxdiff"] = float(maxdiff(state2, restored))
        distributed.barrier("drill-done")

    if args.out and distributed.is_main_process():
        with open(args.out, "w") as f:
            json.dump(record, f)
    print(f"[worker {args.process_id}] {record}", file=sys.stderr)


if __name__ == "__main__":
    main()
