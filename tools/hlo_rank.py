"""Rank the entry-computation instructions of a dumped HLO module by
estimated HBM traffic (operand + result bytes).

On TPU every top-level scheduled op round-trips HBM for its operands and
results, so summing shape sizes over the ENTRY instruction list is a good
first-order traffic model (it over-counts operands that stay resident in
VMEM across consumers, and fusions' internal temporaries are free). Use
it to find which layers the memory-bound step actually spends on —
`jax.profiler` hangs over the tunneled backend (ROADMAP), so this plus
tools/hlo_dump.py is the attribution path.

Usage:
  python tools/hlo_dump.py train 8          # writes /tmp/mvit_hlo/train_bs8.txt
  python tools/hlo_rank.py /tmp/mvit_hlo/train_bs8.txt [topn]
"""

import collections
import re
import sys

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}

SHAPE_RE = re.compile(r"\b(f32|bf16|f16|f64|s64|s32|s16|s8|u64|u32|u16|u8|pred)\[([0-9,]*)\]")


def shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def line_bytes(line):
    """Sum all shapes printed on an entry instruction line: the result
    shape plus each operand's inline shape annotation."""
    # Cut metadata/backend_config tails (no shapes there, but op_name
    # strings can contain brackets).
    cut = line.find(", metadata={")
    if cut != -1:
        line = line[:cut]
    return sum(shape_bytes(m) for m in SHAPE_RE.finditer(line))


OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def group_key(op_name):
    """Collapse an op_name path to a readable layer bucket."""
    # jit(train_step)/transpose(jvp(...))/... -> keep the model-path part
    m = re.search(r"(blocks[._]\d+|patch_embed|head\b|norm\b|pos_embed|"
                  r"rand_aug|erase|mixup|preprocess|opt|adamw?|sgd)", op_name)
    tag = m.group(1) if m else (op_name.split("/")[-1][:40] or "?")
    bwd = "transpose(" in op_name or "jvp(" in op_name and "transpose" in op_name
    return f"{tag}{':bwd' if 'transpose(' in op_name else ''}"


def main():
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    lines = open(path).read().splitlines()
    # entry computation starts at 'ENTRY %'
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("ENTRY "))
    except StopIteration:
        sys.exit("no ENTRY computation found")
    rows = []
    groups = collections.Counter()
    op_groups = collections.Counter()
    total = 0
    staging_dedup = [0, 0]  # [S(1) prefetch staging, ConcatBitcast alias]
    for l in lines[start + 1:]:
        if l.startswith("}"):
            break
        ls = l.strip()
        if not ls or ls.startswith("ROOT tuple") or "= " not in ls:
            continue
        name = ls.split(" = ", 1)[0]
        m = OPNAME_RE.search(l)
        op_name = m.group(1) if m else ""
        op = ls.split(" = ", 1)[1]
        # Opcode follows the result shape. Tuple-result shapes contain
        # spaces and nested parens (layout annotations), so find the
        # opcode as the token right before the operand list instead.
        opk = re.search(r"(?:^|\s)([a-z][\w-]*)\(", op)
        kind = opk.group(1) if opk else "?"
        # Aliasing / bookkeeping ops move no HBM bytes; *-done pairs are
        # already counted at their *-start.
        if kind in ("bitcast", "get-tuple-element", "tuple", "parameter",
                    "constant", "copy-done", "async-done", "after-all"):
            continue
        head = ls[: ls.find(", metadata={")] if ", metadata={" in ls else ls
        if kind in ("copy-start", "async-start"):
            # Tuple-result async ops print (context/full-input, moved-slice,
            # token): the real HBM movement is the moved slice only.
            sizes = [shape_bytes(m) for m in SHAPE_RE.finditer(head)]
            sizes = [s for s in sizes if s > 1024]
            b = min(sizes) if sizes else line_bytes(ls)
            # MSA prefetch into VMEM (S(1) on the result side): this IS the
            # consumer fusion's operand read, which the ranker also counts
            # at the consumer — track for the deduped total.
            res_part = head.split(kind + "(")[0]
            if "S(1)" in res_part:
                staging_dedup[0] += b
        else:
            b = line_bytes(ls)
            if kind == "custom-call" and 'custom_call_target="ConcatBitcast"' in ls:
                # TPU concat-by-aliasing: no data movement.
                staging_dedup[1] += b
        total += b
        groups[group_key(op_name)] += b
        op_groups[kind] += b
        rows.append((b, name, kind, op_name[:110]))
    # Second pass: attribute un-named async staging (slice-start /
    # copy-start) to the op that consumes the corresponding -done value —
    # the staging read IS that consumer's operand traffic.
    entry_lines = []
    for l in lines[start + 1:]:
        if l.startswith("}"):
            break
        entry_lines.append(l.strip())
    name_to_opname = {}
    for ls in entry_lines:
        if " = " not in ls:
            continue
        nm = ls.split(" = ", 1)[0].lstrip("%")
        m = OPNAME_RE.search(ls)
        if m:
            name_to_opname[nm] = m.group(1)
    restaged = collections.Counter()
    for idx, (b, name, kind, op_name) in enumerate(rows):
        if op_name or kind not in ("copy-start", "async-start"):
            continue
        done = name.lstrip("%").replace("start", "done")
        consumer = ""
        probe = f"%{done}"
        for ls in entry_lines:
            if " = " not in ls:
                continue
            rhs = ls.split(" = ", 1)[1]
            if probe + ")" in rhs or probe + "," in rhs or probe + " " in rhs:
                nm = ls.split(" = ", 1)[0].lstrip("%")
                consumer = name_to_opname.get(nm, "")
                # follow one get-tuple-element hop
                if not consumer:
                    probe2 = f"%{nm}"
                    for ls2 in entry_lines:
                        if " = " not in ls2:
                            continue
                        rhs2 = ls2.split(" = ", 1)[1]
                        if probe2 + ")" in rhs2 or probe2 + "," in rhs2:
                            nm2 = ls2.split(" = ", 1)[0].lstrip("%")
                            consumer = name_to_opname.get(nm2, "")
                            if consumer:
                                break
                if consumer:
                    break
        if consumer:
            restaged[group_key(consumer) + ":staged"] += b
            groups["?"] -= b
            rows[idx] = (b, name, kind, "(staged for) " + consumer[:90])
    for k, v in restaged.items():
        groups[k] += v
    rows.sort(reverse=True)
    print(f"total est. entry traffic: {total / 1e9:.1f} GB")
    print(
        f"deduped (- {staging_dedup[0] / 1e9:.1f} GB VMEM-prefetch staging "
        f"double-count, - {staging_dedup[1] / 1e9:.1f} GB ConcatBitcast "
        f"aliasing): {(total - sum(staging_dedup)) / 1e9:.1f} GB"
    )
    print("\n== top instructions ==")
    for b, name, kind, op_name in rows[:topn]:
        print(f"{b / 1e6:9.1f} MB  {kind:18s} {name[:36]:36s} {op_name}")
    print("\n== by layer bucket ==")
    for k, v in groups.most_common(30):
        print(f"{v / 1e9:8.2f} GB  {k}")
    print("\n== by op kind ==")
    for k, v in op_groups.most_common(15):
        print(f"{v / 1e9:8.2f} GB  {k}")


if __name__ == "__main__":
    main()
