"""Dump the optimized HLO of the bench render program and summarize the
non-fusion ops (copies / transposes / gathers / custom-calls) by byte volume.

Residue hunt: stage sums (sampling 6.6 + kernel 12.0 + small) leave ~4 s of
the 22.8 s e2e unattributed; layout copies XLA inserts around the Pallas
call or lax.map would show up here as large `copy`/`transpose` ops.
"""
import collections
import os
import re
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from pgdvs_tpu.data.synthetic import make_contract_data
    from pgdvs_tpu.renderers.compose import render_novel_view
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models

    h, w = 288, 550
    n_src = 10
    cfg = RenderConfig(
        n_coarse_samples_per_ray=256,
        sample_inv_uniform=True,
        gnt_use_masked_spatial_src=True,
        ray_tile=4096,
        epipolar_mode="quad",
        use_pallas_gnt=True,
        pallas_ray_block=4,
        pallas_kernel=os.environ.get("BENCH_PALLAS_KERNEL", "mono3"),
        pallas_fold_ray_diff=True,
    )
    data = make_contract_data(h=h, w=w, n_spatial=n_src, n_frames=12, tgt_time=0.5)
    dev_data = {
        k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))
    }
    models = make_gnt_models()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=n_src)
    params = jax.device_put(params, jax.devices()[0])

    render = jax.jit(
        lambda p, d, k: render_novel_view(models, p, d, cfg, k, static_mode="gnt")
    )
    lowered = render.lower(params, dev_data, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    out_path = "/tmp/bench_hlo.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out_path}")

    # ---- summarize: per-op-kind byte volume of non-fused top-level ops ----
    shape_re = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")

    def shape_bytes(sig: str) -> int:
        total = 0
        for m in shape_re.finditer(sig):
            dt, dims = m.groups()
            n = 1
            if dims:
                for d in dims.split(","):
                    n *= int(d)
            sz = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                  "s8": 1, "u8": 1, "pred": 1}[dt]
            total += n * sz
        return total

    kind_bytes = collections.Counter()
    kind_count = collections.Counter()
    big_ops = []
    # match lines like: %name = f32[...] opcode(...)
    op_re = re.compile(r"=\s*(?:\([^)]*\)|[a-z0-9_\[\],{}<>\. ]+?)\s+([a-z][a-z0-9\-]*)\(")
    for line in txt.splitlines():
        line = line.strip()
        if not line or "=" not in line:
            continue
        m = op_re.search(line)
        if not m:
            continue
        op = m.group(1)
        if op in ("fusion", "parameter", "constant", "tuple",
                  "get-tuple-element", "bitcast"):
            continue
        b = shape_bytes(line.split(" = ", 1)[-1].split("(", 1)[0])
        kind_bytes[op] += b
        kind_count[op] += 1
        if b > 50_000_000:
            big_ops.append((b, line[:220]))

    print("\n== top-level op bytes (output shapes) ==")
    for op, b in kind_bytes.most_common(15):
        print(f"{op:24s} n={kind_count[op]:4d}  {b/1e9:8.3f} GB")
    print("\n== ops with >50MB output ==")
    for b, line in sorted(big_ops, reverse=True)[:25]:
        print(f"{b/1e6:9.1f} MB  {line}")


if __name__ == "__main__":
    main()
