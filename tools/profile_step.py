"""Op-level device-time profile of the flagship train step (or the
single-slide inference step).

Runs the bench workload (brca_paths_0, B=32, synthetic BRCA-shaped
pyramids — the exact program bench.py times) under `jax.profiler` with a
perfetto trace, then parses the trace and prints the top XLA ops by
device-busy time. This is the reproducible version of the ad-hoc
profiling behind ARCHITECTURE.md's device-busy numbers: it answers
"where do the milliseconds go?" before anyone reaches for a new kernel.

Usage (real chip; the step program is in .jax_cache so no long compile):

    python tools/profile_step.py                # train step, top 25 ops
    python tools/profile_step.py --what eval    # inference step
    python tools/profile_step.py --steps 20 --top 40 --json out.json

The reference has no profiling story at all (SURVEY.md §5); its training
loop is timed with tqdm only (`train.py:59-68`).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_perfetto(logdir: str) -> dict:
    paths = glob.glob(os.path.join(logdir, "**", "*.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f)


_OP_SUFFIX = re.compile(r"[._-]?\d+$")


def _op_family(name: str) -> str:
    """fusion.123 -> fusion; dot.4 -> dot; custom-call.7 -> custom-call."""
    return _OP_SUFFIX.sub("", name)


def device_op_table(trace: dict) -> tuple[dict, dict, float]:
    """Sum device-track event durations by exact op and by op family.

    The device process hosts three parallel tracks (thread lanes): "Steps"
    (one event per step, named "0","1",…), "XLA Modules" (one event per
    executable, named "jit_update(…)"), and "XLA Ops" (the real per-op
    events). Summing all three triple-counts device time, so we keep only
    the op lane, identified by its thread_name metadata.
    Returns (by_op_us, by_family_us, total_us).
    """
    events = trace.get("traceEvents", [])
    pid_name: dict = {}
    tid_name: dict = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "device" in n.lower() or "tpu" in n.lower()
                or "xla" in n.lower()}
    if not dev_pids:  # CPU backend: XLA ops land on host threads; keep all
        dev_pids = set(pid_name)
    op_lanes = {k for k, n in tid_name.items()
                if k[0] in dev_pids and n.startswith("XLA Ops")}

    by_op: dict = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_lanes and (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "")
        # fallback when no thread metadata: drop the wrapper lanes by name
        if not op_lanes and (name.isdigit() or name.startswith("jit_")
                             or name.startswith(("XLA Modules:", "XLA Ops:",
                                                 "Steps:"))):
            continue
        by_op[name] += float(e.get("dur", 0.0))
    by_family: dict = collections.defaultdict(float)
    for name, us in by_op.items():
        by_family[_op_family(name)] += us
    total = sum(by_op.values())
    return dict(by_op), dict(by_family), total


def build_workload(what: str):
    import jax

    import bench
    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.runtime import setup_compilation_cache
    from paths_tpu.train.loop import (make_optimizer, make_step_fns,
                                      make_train_rng)

    setup_compilation_cache()
    tmp = os.environ.get("PATHS_TPU_BENCH_DIR", "/tmp/paths_tpu_bench")
    os.makedirs(tmp, exist_ok=True)
    cfg = bench.flagship_config(tmp)
    ds, (bag0, tables, labels) = bench.build_batch(cfg)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    update, evaluate = make_step_fns(cfg, tx)

    if what == "train":
        opt_state = tx.init(params)
        rng = make_train_rng(cfg)

        def step(state):
            params, opt_state = state
            params, opt_state, loss, _ = update(params, opt_state, bag0,
                                                tables, labels, rng)
            return (params, opt_state), loss

        return step, (params, opt_state)

    if what == "eval":
        from paths_tpu.data.dataset import collate_batch

        bag1, tables1, labels1 = collate_batch(
            ds, [0], level0_bucket=cfg.level0_bucket)

        def step(state):
            loss, _ = evaluate(params, bag1, tables1, labels1)
            return state, loss

        return step, ()

    raise SystemExit(f"unknown --what {what!r} (train|eval)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="train", choices=["train", "eval"])
    ap.add_argument("--steps", type=int, default=10,
                    help="steps inside the trace window")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None,
                    help="also write the full table as JSON")
    ap.add_argument("--logdir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()

    import jax

    step, state = build_workload(args.what)

    for _ in range(3):  # compile + absorb the post-compile penalty
        state, loss = step(state)
    float(loss)

    logdir = args.logdir or tempfile.mkdtemp(prefix="paths_tpu_prof_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        for _ in range(args.steps):
            state, loss = step(state)
        float(loss)  # the only reliable barrier on tunneled devices
    finally:
        jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    by_op, by_family, total_us = device_op_table(_load_perfetto(logdir))
    per_step_us = total_us / args.steps

    dev = str(jax.devices()[0])
    print(f"# {args.what} step profile — {args.steps} steps on {dev}")
    print(f"wall {wall * 1e3 / args.steps:.2f} ms/step, "
          f"device-busy {per_step_us / 1e3:.2f} ms/step "
          f"({per_step_us / 1e3 / (wall * 1e3 / args.steps) * 100:.0f}% of wall)")
    print(f"\n{'us/step':>10}  {'% dev':>6}  op family")
    fam = sorted(by_family.items(), key=lambda kv: -kv[1])
    for name, us in fam[:args.top]:
        print(f"{us / args.steps:>10.1f}  {us / total_us * 100:>6.1f}  {name}")
    rest = sum(us for _, us in fam[args.top:])
    if rest:
        print(f"{rest / args.steps:>10.1f}  {rest / total_us * 100:>6.1f}  "
              f"(+{len(fam) - args.top} more)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"what": args.what, "steps": args.steps,
                       "wall_ms_per_step": wall * 1e3 / args.steps,
                       "device_us_per_step": per_step_us,
                       "by_family_us": by_family, "by_op_us": by_op,
                       "device": dev}, f, indent=1, sort_keys=True)
        print(f"\nfull table -> {args.json}")
    if not args.logdir:
        import shutil

        shutil.rmtree(logdir, ignore_errors=True)
    else:
        print(f"raw trace -> {logdir}")


if __name__ == "__main__":
    main()
