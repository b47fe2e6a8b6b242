"""Capture a jax.profiler trace of the full train step and aggregate device time.

Usage: python scripts/profile_step.py [--out /tmp/trace_step] [--top 40]
Parses the Chrome-trace JSON the TPU profiler writes and sums X-phase event
durations on the device pid, grouped by sanitized HLO-op name prefix.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(out_dir: str) -> None:
    from esvit_tpu import config
    from esvit_tpu.train.step import EsViTTrainer

    B = 32
    cfg = config.TrainConfig(
        model=config.swin_tiny(),
        head=config.HeadConfig(),
        loss=config.LossConfig(use_dense_prediction=True),
        optim=config.OptimConfig(batch_size_per_device=B),
        steps_per_epoch=1251,
        dtype=jnp.bfloat16,
    )
    trainer = EsViTTrainer(cfg, total_batch_size=B)
    rng = jax.random.PRNGKey(0)
    batch = (jax.random.normal(rng, (2 * B, 224, 224, 3), jnp.float32),
             jax.random.normal(rng, (8 * B, 96, 96, 3), jnp.float32))
    state = trainer.init_state(rng, batch)
    step = jax.jit(trainer.train_step)
    # Dump the optimized HLO so aggregate() can map trace event names
    # (fusion.1234, copy.567) back to shapes + JAX source ops.
    os.makedirs(out_dir, exist_ok=True)
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    with gzip.open(os.path.join(out_dir, "hlo.txt.gz"), "wt") as f:
        f.write(compiled.as_text())
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        _ = float(metrics["loss"])
    print(f"3 steps traced in {(time.perf_counter()-t0)*1e3:.1f} ms wall")


GROUPS = [
    ("attn_packed", re.compile(r"packed|pallas", re.I)),
    ("attn_dot", re.compile(r"(qk|scores|attn|softmax)", re.I)),
    ("dot", re.compile(r"^(dot|loop_dot|convolution)", re.I)),
    ("copy/layout", re.compile(r"^(copy|transpose|bitcast|reshape|slice|concatenate|dynamic|pad|gather|scatter|select|iota|broadcast|reverse)", re.I)),
    ("fusion", re.compile(r"^(fusion|loop_fusion|input_fusion|output_fusion)", re.I)),
    ("reduce", re.compile(r"^(reduce|all-reduce)", re.I)),
]


def aggregate(out_dir: str, top: int) -> None:
    paths = sorted(glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {out_dir}"
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    # Identify device pids: process_name metadata containing 'TPU' or 'Device'
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    xs = [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev_pids]
    # Drop nested lanes double counting: keep the busiest tid per pid? Instead
    # report both totals and per-name sums (names are HLO ops; lanes are
    # usually one XLA Ops lane per core).
    tnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    lanes = {k for k, v in tnames.items()
             if v == "XLA Ops" and k[0] in dev_pids}
    assert lanes, f"no 'XLA Ops' lane among {tnames}"
    main = next(iter(lanes))
    xs = [e for e in xs if (e["pid"], e["tid"]) == main]
    total = sum(e.get("dur", 0) for e in xs) / 1e3
    print(f"device lane {main}: {total:.1f} ms over 3 steps "
          f"({total/3:.1f} ms/step)")
    by_name = collections.Counter()
    for e in xs:
        name = re.sub(r"[.\d]+$", "", e["name"])
        by_name[name] += e.get("dur", 0)
    print(f"\n top {top} ops (ms over 3 steps):")
    for name, dur in by_name.most_common(top):
        print(f"  {dur/1e3:9.2f}  {name}")

    # ---- per-HLO detail: map the big generic buckets (fusion.N, copy.N)
    # back to shapes + JAX source via the dumped optimized HLO text.
    hlo_path = os.path.join(out_dir, "hlo.txt.gz")
    if not os.path.exists(hlo_path):
        return
    meta = {}
    head_pat = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = (\S+) (\w+)\(")
    op_pat = re.compile(r'op_name="([^"]*)"')
    with gzip.open(hlo_path, "rt") as f:
        for line in f:
            m = head_pat.match(line)
            if m:
                name, shape, opcode = m.groups()
                om = op_pat.search(line)
                meta[name] = (shape, opcode, om.group(1) if om else "")
    by_full = collections.Counter()
    for e in xs:
        by_full[e["name"]] += e.get("dur", 0)
    print(f"\n top {top} individual HLOs (ms over 3 steps):")
    for name, dur in by_full.most_common(top):
        shape, opcode, op_name = meta.get(name, ("?", "?", ""))
        # Trim the op_name to the informative tail (jit(train_step)/... ).
        op_name = re.sub(r"^jit\([\w_]+\)/", "", op_name)
        if len(op_name) > 110:
            op_name = "..." + op_name[-107:]
        print(f"  {dur/1e3:9.2f}  {name:24s} {shape:34s} {op_name}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/trace_step")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--parse-only", action="store_true")
    a = p.parse_args()
    if not a.parse_only:
        capture(a.out)
    aggregate(a.out, a.top)
