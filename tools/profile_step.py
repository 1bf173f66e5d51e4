"""Per-op device-time profile of the train step on the real TPU.

jax.profiler traces now work on this backend (the round-1 hang is gone):
capture a few steps, parse the xplane.pb device plane directly with
tensorflow's bundled proto (tensorboard_plugin_profile is ABI-broken
against tf 2.21), and aggregate "XLA Ops" event durations. Instruction
names are joined against the dumped HLO's `op_name` metadata
(tools/hlo_dump.py) for per-layer attribution, replacing the entry-bytes
*estimates* of tools/hlo_rank.py with measured time.

Usage:
  python tools/profile_step.py [variant] [batch]   # default: base 8
  (variant names from tools/ablate.py VARIANTS)

Prints: total device time/step, top ops, per-layer and per-category
rollups. Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set
internally before tf import).
"""

import collections
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

TRACE_DIR = "/tmp/pmv_tpu_trace"
STEPS = 6


def capture(variant, batch):
    import jax
    from tools.ablate import VARIANTS, base_cfg, make_batch

    from pmv_tpu.engine import steps
    from pmv_tpu.models import build_model
    from pmv_tpu.parallel import mesh as mesh_lib
    from pmv_tpu.utils import misc

    if variant.startswith("family:"):
        # Per-family profiling (VERDICT r3 #5): e.g. `family:x3d_m 8`.
        from tools.family_bench import FAMILIES, family_cfg

        yaml_rel, _, aug = FAMILIES[variant.split(":", 1)[1]]
        cfg = family_cfg(yaml_rel, aug)
    else:
        cfg = VARIANTS[variant](base_cfg())
    model = build_model(cfg)
    rng = misc.root_key(cfg)
    mesh = mesh_lib.create_mesh()
    batch_data = mesh_lib.shard_batch(make_batch(cfg, batch), mesh)
    state, tx = steps.init_state(cfg, model, batch_data, rng)
    state = mesh_lib.replicate(state, mesh)
    train_step = jax.jit(steps.make_train_step(cfg, model, tx))

    def step(state, data):
        return train_step(state, data, rng, 1e-4)

    # Exact optimized HLO of the executable we run: instruction-name ->
    # op_name metadata for attribution.
    compiled = train_step.lower(state, batch_data, rng, 1e-4).compile()
    hlo_text = compiled.as_text()
    opname = {}
    for ls in hlo_text.splitlines():
        ls = ls.strip()
        if not ls.startswith("%") or " = " not in ls:
            continue
        mm = re.search(r'op_name="([^"]*)"', ls)
        if mm:
            opname[ls.split(" = ", 1)[0].lstrip("%")] = mm.group(1)
    del hlo_text

    # Warm up (compile + first dispatch).
    for _ in range(2):
        state, metrics = step(state, batch_data)
    jax.device_get(metrics["loss"])
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(STEPS):
        state, metrics = step(state, batch_data)
    jax.device_get(metrics["loss"])
    jax.profiler.stop_trace()
    paths = glob.glob(TRACE_DIR + "/plugins/profile/*/*.xplane.pb")
    assert paths, "no xplane produced"
    return max(paths, key=os.path.getmtime), opname


def parse(xplane_path, opname_map):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplane_path, "rb").read())
    per_op = collections.Counter()  # instruction name -> total ps
    occ = collections.Counter()
    module_ps = 0
    for p in xs.planes:
        if not p.name.startswith("/device:"):
            continue
        ev_meta = {k: v for k, v in p.event_metadata.items()}
        for l in p.lines:
            if l.name == "XLA Modules":
                for e in l.events:
                    module_ps += e.duration_ps
            if l.name not in ("XLA Ops",):
                continue
            for e in l.events:
                nm = ev_meta[e.metadata_id].name
                # Event names can be the full instruction text; keep the
                # bare instruction name for the op_name join.
                nm = nm.split(" = ", 1)[0].strip().lstrip("%")
                per_op[nm] += e.duration_ps
                occ[nm] += 1
    return per_op, occ, module_ps


CATS = [
    ("attn-core", r"/attn/.*(bhqk|bqhc|softmax|reduce_max|/sub\b|exp|divide)"),
    ("attn-pools", r"/attn/pool"),
    ("attn-qkv/proj", r"/attn/(qkv|proj|q\b|k\b|v\b)"),
    ("attn-relpos", r"rel_pos|rel_q"),
    ("attn-other", r"/attn/"),
    ("mlp", r"/mlp/"),
    ("block-ln", r"/norm\d"),
    ("stem", r"patch_embed|pos_embed|norm_stem"),
    ("aug/preprocess", r"aug|eras|mixup|preproc|resize|jitter|random_|uniform|threefry|rng"),
    ("optimizer", r"adam|sgd|opt_|clip|global_norm|scale_by|weight_decay"),
    ("head/loss", r"head|loss|logit|cross_entropy|log_softmax|metric|top_?k"),
]


def categorize(op_name):
    if not op_name:
        return "(no metadata)"
    for cat, pat in CATS:
        if re.search(pat, op_name, re.I):
            return cat
    return "misc"


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path, opname = capture(variant, batch)
    print("xplane:", path)
    per_op, occ, module_ps = parse(path, opname)
    tot = sum(per_op.values())
    print(f"device XLA-Ops time: {tot/1e12/STEPS*1e3:.2f} ms/step over "
          f"{STEPS} steps ({len(per_op)} distinct ops); "
          f"module span {module_ps/1e12/STEPS*1e3:.2f} ms/step")

    def attribution(nm):
        return opname.get(nm) or opname.get(nm.lstrip("%")) or ""

    print("\n== top ops by device time ==")
    for nm, ps in per_op.most_common(40):
        on = attribution(nm)
        print(f"  {ps/1e9/STEPS:8.3f} ms  x{occ[nm]//STEPS:<3d} {nm[:34]:36s} {on[-80:]}")

    by_layer = collections.Counter()
    by_cat = collections.Counter()
    for nm, ps in per_op.items():
        on = attribution(nm)
        m = re.search(r"blocks\.(\d+)", on)
        layer = (f"blocks.{m.group(1)}" + (":bwd" if "transpose(" in on else "")
                 ) if m else ("?" if not on else "non-block")
        by_layer[layer] += ps
        by_cat[categorize(on) + (":bwd" if "transpose(" in on else "")] += ps

    print("\n== by category ==")
    for k, v in by_cat.most_common(30):
        print(f"  {v/1e9/STEPS:8.3f} ms  {k}")
    print("\n== by layer ==")
    for k, v in by_layer.most_common(25):
        print(f"  {v/1e9/STEPS:8.3f} ms  {k}")
    # Full per-op dump for offline analysis.
    dump = [
        {"name": nm, "ms": ps / 1e9 / STEPS, "n": occ[nm] // STEPS,
         "op_name": attribution(nm)}
        for nm, ps in per_op.most_common()
    ]
    out = f"/tmp/pmv_profile_{variant}_bs{batch}.json"
    json.dump(dump, open(out, "w"))
    print("per-op dump:", out)
    print(json.dumps({"variant": variant, "batch": batch,
                      "device_ms_per_step": round(tot / 1e9 / STEPS, 2)}))


if __name__ == "__main__":
    main()
