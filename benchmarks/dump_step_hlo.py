"""Dump the compiled pretrain-step HLO and inventory copy/fusion pressure.

Dev tool (companion to dump_sampler_hlo.py): compiles the flagship
pretrain step (bench.py config) and prints

- total op counts by HLO opcode family,
- every ``copy`` op grouped by operand shape with estimated HBM bytes,
- the largest fusions by output-shape bytes,

so layout-copy regressions can be attributed to source modules without a
device trace.  Compile is served by the remote-compile cache when the same
program was built before (e.g. by bench.py / trace_step.py).
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from moleculesde_tpu.data.synthetic import synthetic_compact_batch
from moleculesde_tpu.pretrain import (
    PretrainConfig, create_pretrain_state, make_pretrain_step)

OUT = os.environ.get("HLO_OUT", "/tmp/step_hlo.txt")

_DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
             "u8": 1, "f16": 2, "s64": 8, "u64": 8, "c64": 8, "u16": 2,
             "s16": 2}


def shape_bytes(shape: str) -> int:
    """'f32[256,32,128]{...}' -> byte count (0 for tuples/unparsable)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DT_BYTES.get(dt, 4)


def main():
    b = int(os.environ.get("HLO_BATCH", 256))
    cfg = PretrainConfig(emb_dim=300, dropout_ratio=0.0,
                         cl_similarity_metric="EBM_node_dot_prod",
                         model_3d=os.environ.get("HLO_MODEL3D", "SchNet"),
                         microbatch=int(os.environ.get("HLO_MB", 0)))
    batch = jax.device_put(synthetic_compact_batch(num_graphs=b, n_max=32,
                                                   seed=0))
    key = jax.random.PRNGKey(0)
    models, state = create_pretrain_state(cfg, batch, key)
    step = make_pretrain_step(models, cfg, jit=False)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, key, jnp.asarray(1.0))
    txt = lowered.compile().as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    print(f"wrote {OUT} ({len(txt)} chars)")

    op_counts = defaultdict(int)
    copies = defaultdict(lambda: [0, 0])   # shape -> [count, bytes]
    fusion_bytes = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\S+) ([\w-]+)\(", line)
        if not m:
            continue
        shape, opcode = m.groups()
        op_counts[opcode] += 1
        if opcode == "copy":
            sb = shape_bytes(shape)
            copies[shape][0] += 1
            copies[shape][1] += sb
        elif opcode == "fusion":
            fusion_bytes.append((shape_bytes(shape), shape))

    print("\n-- op counts --")
    for op, c in sorted(op_counts.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{c:6d}  {op}")

    print("\n-- copies by shape (count, total MB) --")
    tot = 0
    for shape, (c, bts) in sorted(copies.items(), key=lambda kv: -kv[1][1]):
        tot += bts
        if bts > 1 << 20 or c >= 8:
            print(f"{c:5d}  {bts / 1e6:9.2f} MB  {shape[:90]}")
    print(f"total copy bytes: {tot / 1e6:.1f} MB "
          f"({sum(c for c, _ in copies.values())} copies)")

    print("\n-- largest fusions by output bytes --")
    for bts, shape in sorted(fusion_bytes, reverse=True)[:15]:
        print(f"{bts / 1e6:9.2f} MB  {shape[:90]}")


if __name__ == "__main__":
    main()
