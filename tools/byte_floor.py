"""Analytic HBM-byte floor for the flagship MViTv2-S 16x4 train step.

VERDICT r4 missing #2: every perf claim rests on measured traffic numbers
with no analytic lower bound next to them. This tool computes, from the
config alone (via the model's own `_compute_mvit_schedule`), the bytes a
train step MUST move under the current algorithm, assuming perfect fusion:

- every dense layer materializes its input and output exactly once in fwd
  (read in, write out) and in bwd reads the saved input once, reads the
  incoming grad once, writes dx once (dW accumulates in VMEM; its HBM cost
  is the f32 grad write counted in the optimizer bucket);
- chunked attention (the shipped TPU.ATTN_Q_CHUNK recipe) keeps probs in
  VMEM and recomputes them in bwd, so the attention core costs only the
  q/k/v/out streams (fwd reads + bwd re-reads + grad writes);
- LayerNorms cost read+write fwd, read(dy)+read(saved)+write(dx) bwd;
- the optimizer reads and writes params + both AdamW moments in f32 and
  consumes the f32 grads once; the bf16 param copies used by the matmuls
  are written once and read twice (fwd, bwd-dx);
- the augmentation chain reads the uint8 batch and writes the bf16 model
  input with ~2 intermediate round-trips (RandAugment affine + erase).

Anything the measured step moves beyond this is program overhead (layout
copies, staging, uncoalesced fusions), not the model.

Usage: python tools/byte_floor.py [batch_size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BF16 = 2
F32 = 4
V5E_GBPS = 819e9  # HBM bandwidth, TPU v5e
V5P_GBPS = 2765e9
V6E_GBPS = 1640e9


def _prod(xs):
    p = 1
    for x in xs:
        p *= int(x)
    return p


def dense_bytes(n_tokens, cin, cout, dtype=BF16):
    """Floor bytes for one dense layer over the step (fwd+bwd), activations
    only: fwd read(in)+write(out); bwd read(dy)+read(saved in)+write(dx)."""
    fwd = n_tokens * (cin + cout) * dtype
    bwd = n_tokens * (cout + cin + cin) * dtype
    return fwd + bwd


def ln_bytes(n_tokens, c, dtype=BF16):
    """LayerNorm floor: fwd read+write; bwd read(dy)+read(saved)+write."""
    return n_tokens * c * dtype * (2 + 3)


def main():
    from __graft_entry__ import _mvitv2_s_cfg, apply_bench_recipe
    from pmv_tpu.models.mvit import _compute_mvit_schedule

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = apply_bench_recipe(_mvitv2_s_cfg(tiny=False))

    t = cfg.DATA.NUM_FRAMES // cfg.MVIT.PATCH_STRIDE[0]
    h = cfg.DATA.TRAIN_CROP_SIZE // cfg.MVIT.PATCH_STRIDE[1]
    w = cfg.DATA.TRAIN_CROP_SIZE // cfg.MVIT.PATCH_STRIDE[2]
    thw = [t, h, w]
    cls = 1 if cfg.MVIT.CLS_EMBED_ON else 0

    schedule = _compute_mvit_schedule(cfg)

    buckets = {}

    def add(k, v):
        buckets[k] = buckets.get(k, 0) + v

    # --- stem: uint8 input read by aug, bf16 aug output, patch-embed conv.
    in_px = batch * cfg.DATA.NUM_FRAMES * cfg.DATA.TRAIN_CROP_SIZE ** 2 * 3
    # aug chain: read u8, ~2 intermediate bf16 round trips (RandAugment
    # band-matmul + erase), write bf16 model input; mixup one more pass.
    add("aug_chain", in_px * (1 + 2 * 2 * BF16 + BF16))
    n0 = _prod(thw)
    c0 = cfg.MVIT.EMBED_DIM
    # patch-embed conv: read bf16 input (fwd + bwd-dW recompute read),
    # write [B,N0,C0]; bwd reads dy (dW accumulates in VMEM).
    add("stem", in_px * BF16 * 2 + batch * n0 * c0 * BF16 * 2)
    add("stem", batch * n0 * c0 * BF16)  # bwd dy read

    # --- blocks.
    size = list(thw)
    for i, spec in enumerate(schedule):
        dim, dim_out, heads = spec["dim"], spec["dim_out"], spec["num_heads"]
        n = _prod(size) + cls
        # kv token count after pooling (sparse decimated projection).
        skv = spec["stride_kv"] or (1, 1, 1)
        nkv = _prod([max(1, s // k) for s, k in zip(size, skv)]) + cls
        sq = spec["stride_q"] or (1, 1, 1)
        size_out = [max(1, s // k) for s, k in zip(size, sq)]
        nq = _prod(size_out) + cls

        b = batch
        # qkv projections: q full-rank; k,v only at the decimated rows.
        add("qkv_proj", b * dense_bytes(n, dim, dim_out))          # q
        add("qkv_proj", b * 2 * dense_bytes(nkv, dim, dim_out))    # k, v
        # pools: q pool conv reads the q grid, writes the pooled grid
        # (k/v are projected at decimated rows already).
        if spec["stride_q"]:
            add("pools", b * (n + nq) * dim_out * BF16 * 2)  # fwd+bwd
        # pool LNs on q (always) + k + v.
        add("pools", b * ln_bytes(nq, dim_out))
        add("pools", b * 2 * ln_bytes(nkv, dim_out))
        # attention core, chunked (probs live in VMEM): fwd reads q,k,v
        # writes out; bwd re-reads q,k,v (recompute), reads dy, writes
        # dq,dk,dv.
        qb = nq * dim_out
        kvb = nkv * dim_out
        add("attn_core", b * BF16 * (qb + 2 * kvb + qb))            # fwd
        add("attn_core", b * BF16 * (qb + 2 * kvb + qb + qb + 2 * kvb))
        # rel-pos tables are small; their gather/scatter is counted in
        # attn_core via the extended matmul operands (already included).
        # output projection + residual add.
        add("out_proj", b * dense_bytes(nq, dim_out, dim_out))
        add("residual", b * nq * dim_out * BF16 * 4)  # fwd add r+w, bwd r+w
        # LN1 (pre-attention, at n tokens) + LN2 (pre-MLP, at nq tokens).
        add("block_ln", b * ln_bytes(n, dim))
        add("block_ln", b * ln_bytes(nq, dim_out))
        # MLP: fc1 (C -> 4C), gelu (fused), fc2 (4C -> C) + residual.
        add("mlp", b * dense_bytes(nq, dim_out, 4 * dim_out))
        add("mlp", b * dense_bytes(nq, 4 * dim_out, dim_out))
        add("residual", b * nq * dim_out * BF16 * 4)
        size = size_out

    # --- head + loss: negligible but counted.
    c_last = schedule[-1]["dim_out"]
    add("head", batch * (c_last + cfg.MODEL.NUM_CLASSES) * BF16 * 4)

    # --- params/optimizer: count params from the schedule.
    n_params = 0
    # stem conv (3*k^3*C0) ~ small; qkv/proj/mlp dominate.
    n_params += 3 * _prod(cfg.MVIT.PATCH_KERNEL) * c0 + c0
    for spec in schedule:
        dim, dim_out = spec["dim"], spec["dim_out"]
        n_params += dim * dim_out * 3 + 3 * dim_out        # qkv
        n_params += dim_out * dim_out + dim_out            # proj
        n_params += dim_out * 4 * dim_out + 4 * dim_out    # fc1
        n_params += 4 * dim_out * dim_out + dim_out        # fc2
        n_params += 8 * dim_out                            # LNs (4x scale+bias)
        # pool convs: depthwise 3x3x3 per channel.
        n_params += 27 * dim_out * 3
    n_params += c_last * cfg.MODEL.NUM_CLASSES
    # rel-pos tables.
    for spec in schedule:
        n_params += 3 * 200 * spec["dim_out"] // spec["num_heads"] * spec[
            "num_heads"]
    # AdamW: read+write p,m,v in f32 (24B), read f32 grad once (4B), grad
    # was written once by the bwd (4B); bf16 param copy write + 2 reads.
    opt_bytes = n_params * (24 + 4 + 4 + BF16 * 3)
    add("params_opt", opt_bytes)

    total = sum(buckets.values())
    flops = 3 * 64.5e9 * batch  # 3x fwd, 64.5 GFLOPs/clip fwd (MODEL_ZOO)

    print(f"# analytic floor, batch={batch}, params={n_params / 1e6:.1f}M")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{v / 1e9:8.3f} GB  {k}")
    print(f"{total / 1e9:8.3f} GB  TOTAL ({total / batch / 1e6:.0f} MB/clip)")
    print(f"# arithmetic intensity at floor: {flops / total:.0f} flops/byte")
    for name, bw in [("v5e", V5E_GBPS), ("v6e", V6E_GBPS), ("v5p", V5P_GBPS)]:
        ms = total / bw * 1e3
        clips = batch / (total / bw)
        print(f"# {name} bandwidth-roofline: {ms:6.2f} ms/step "
              f"= {clips:7.1f} clips/s/chip")
    comp_ms = flops / 197e12 * 1e3
    print(f"# v5e compute-roofline (bf16 197 TF/s): {comp_ms:.2f} ms/step "
          f"= {batch / (comp_ms / 1e3):.1f} clips/s/chip")


if __name__ == "__main__":
    main()
