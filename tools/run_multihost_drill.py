"""Multi-process jax.distributed drill: execute the DCN-boundary claim.

The reference delegates its process-group to ``accelerate launch``
(reference run.sh:1, train.py:492-496); our production equivalent is one
JAX process per TPU host with ``jax.distributed.initialize`` + GSPMD over
the global mesh. This driver proves that path end-to-end WITHOUT a pod:

  1. spawns two ``tools/multihost_worker.py`` processes on localhost
     (coordinator on 127.0.0.1, ``--xla_force_host_platform_device_count``
     virtual CPU devices each) — the 2-host case, cross-process collectives
     riding the distributed runtime exactly as DCN traffic would,
  2. runs a single-process control with the SAME global device count,
  3. asserts the DP and FSDP train-step losses agree across the process
     boundary and that a distributed orbax save of the SHARDED state
     round-trips bit-exactly.

Run:  python tools/run_multihost_drill.py [--local_devices 2] [--keep]
Exits 0 on success and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # CLAUDE.md: no XLA:CPU cache
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def run_drill(local_devices=2, num_processes=2, batch=8, timeout=900, workdir=None):
    workdir = workdir or tempfile.mkdtemp(prefix="mh_drill_")
    port = _free_port()
    outs = [os.path.join(workdir, f"p{i}.json") for i in range(num_processes)]
    ckpt = os.path.join(workdir, "ckpt")
    control_out = os.path.join(workdir, "control.json")

    common = [sys.executable, WORKER, "--batch_size", str(batch)]
    procs = []
    t0 = time.time()
    for pid in range(num_processes):
        cmd = common + [
            "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", str(num_processes),
            "--process_id", str(pid),
            "--local_devices", str(local_devices),
            "--ckpt_dir", ckpt,
            "--out", outs[pid],
        ]
        procs.append(subprocess.Popen(cmd, env=_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    # control: one process, same GLOBAL device count -> same mesh shape
    ctl_cmd = common + [
        "--num_processes", "1", "--process_id", "0",
        "--local_devices", str(local_devices * num_processes),
        "--ckpt_dir", os.path.join(workdir, "ckpt_ctl"),
        "--out", control_out,
    ]
    ctl = subprocess.Popen(ctl_cmd, env=_env(), stdout=subprocess.PIPE,
                           stderr=subprocess.PIPE, text=True)

    failures = []
    for name, p in [("control", ctl)] + [(f"worker{i}", procs[i]) for i in range(num_processes)]:
        try:
            out, err = p.communicate(timeout=timeout - (time.time() - t0) + 60)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            failures.append((name, "timeout", err))
            continue
        if p.returncode != 0:
            failures.append((name, f"rc={p.returncode}", err))
    if failures:
        for name, why, err in failures:
            print(f"--- {name} FAILED ({why}) ---\n{err[-4000:]}", file=sys.stderr)
        raise RuntimeError(f"{len(failures)} drill process(es) failed")

    with open(outs[0]) as f:
        multi = json.load(f)
    with open(control_out) as f:
        control = json.load(f)

    assert multi["process_count"] == num_processes, multi
    assert multi["device_count"] == local_devices * num_processes, multi
    assert control["process_count"] == 1, control
    assert control["device_count"] == multi["device_count"], (control, multi)
    # fp32 step over identical params/batch: the process boundary must be
    # numerically invisible (same global mesh shape, same reduction order)
    for k in ("dp_loss", "fsdp_loss", "dp_grad_norm", "fsdp_grad_norm"):
        d = abs(multi[k] - control[k])
        rel = d / max(abs(control[k]), 1e-12)
        assert rel < 2e-6, (k, multi[k], control[k])
    # DP vs FSDP inside the multi-process run also agree
    assert abs(multi["dp_loss"] - multi["fsdp_loss"]) / abs(multi["dp_loss"]) < 2e-6
    # distributed orbax round-trip of sharded state is exact
    assert multi["restore_maxdiff"] == 0.0, multi

    summary = {
        "ok": True,
        "num_processes": num_processes,
        "devices_per_process": local_devices,
        "dp_loss_multi": multi["dp_loss"],
        "dp_loss_control": control["dp_loss"],
        "fsdp_loss_multi": multi["fsdp_loss"],
        "restore_maxdiff": multi["restore_maxdiff"],
        "wall_s": round(time.time() - t0, 1),
    }
    return summary, workdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    summary, workdir = run_drill(args.local_devices, args.num_processes,
                                 args.batch, args.timeout)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
