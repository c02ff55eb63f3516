"""XLA-trace parsing: per-op device timings + HLO source attribution.

`jax.profiler.trace` on the TPU writes an xplane protobuf whose
"/device:TPU:0" plane carries an "XLA Ops" line — the serialized
TensorCore timeline, one event per executed HLO instruction (scan/while
bodies appear once per iteration). This module aggregates those events
and attributes fusions back to framework source files by parsing the
compiled HLO text's `metadata={... source_file=... source_line=...}`
annotations (the reference's equivalent instrument is the cuda-timer
wrapper at script/dm/DFM_APR_refine.py:25-39; this is the TPU-native,
per-op version of it).
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from dataclasses import dataclass, field


def _latest_xplane(trace_dir: str) -> str:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    return paths[-1]


def load_xla_ops(trace_dir: str):
    """Aggregate the device "XLA Ops" timeline.

    Returns (ops, device_busy_ms, span_ms) where ops maps op name
    (e.g. "%fusion.123") -> dict(ms, count, hlo) and span is
    last-event-end minus first-event-start on the device line.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: TF is heavy

    xs = xplane_pb2.XSpace()
    with open(_latest_xplane(trace_dir), "rb") as f:
        xs.ParseFromString(f.read())

    # container ops (while/call/conditional bodies appear as their own
    # events on the same line) span their members — counting them would
    # double the busy total and swamp the attribution
    def is_container(hlo: str) -> bool:
        # HLO auto-names carry the opcode (%while.11, %conditional.3);
        # parsing the opcode out of the text breaks on tuple-typed ops
        # (the return type contains parens before the opcode token)
        name = hlo.split(" = ", 1)[0].lstrip("%")
        return name.split(".")[0] in ("while", "call", "conditional",
                                      "while-loop")

    ops: dict[str, dict] = {}
    busy_ps = 0
    t_min, t_max = None, 0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                if is_container(md.name):
                    continue
                name = md.name.split(" = ")[0]
                rec = ops.setdefault(name, {"ms": 0.0, "count": 0,
                                            "hlo": md.name[:400]})
                rec["ms"] += ev.duration_ps / 1e9
                rec["count"] += 1
                busy_ps += ev.duration_ps
                start = line.timestamp_ns * 1000 + ev.offset_ps
                t_min = start if t_min is None else min(t_min, start)
                t_max = max(t_max, start + ev.duration_ps)
    span_ms = 0.0 if t_min is None else (t_max - t_min) / 1e9
    return ops, busy_ps / 1e9, span_ms


# --------------------------------------------------------------------------
# HLO text parsing -> per-instruction source attribution
# --------------------------------------------------------------------------

_INSTR_RE = re.compile(
    r"^\s*(ROOT\s+)?(%[\w.\-]+)\s*=\s*((?:\([^)]*\))|\S+)\s+([\w\-]+)")
_COMP_RE = re.compile(r"^(%[\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{\s*$")
_META_RE = re.compile(
    r'metadata={[^}]*?source_file="([^"]+)"[^}]*?source_line=(\d+)')
_CALLS_RE = re.compile(r"calls=(%[\w.\-]+)")
_TO_APPLY_RE = re.compile(r"to_apply=(%[\w.\-]+)")

# opcodes that dominate runtime get a larger attribution weight when a
# fusion's member instructions span several source files
_HEAVY = {"dot": 30.0, "convolution": 30.0, "custom-call": 10.0,
          "scatter": 10.0, "sort": 10.0, "gather": 5.0,
          "reduce": 3.0, "reduce-window": 5.0, "exponential": 2.0}


_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "c64": 8,
                "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "f8e4m3fn": 1, "f8e5m2": 1,
                "s8": 1, "u8": 1, "pred": 1}
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")


def _shape_bytes(shape_txt: str) -> int:
    """Total bytes of an HLO result type ('bf16[4800,192,128]{...}' or a
    tuple '(f32[...], bf16[...])'). Token types (rng state etc.) count 0."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_txt):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


@dataclass
class HloIndex:
    """instr -> opcode / source / called computations; comp -> members."""
    instr_op: dict = field(default_factory=dict)
    instr_src: dict = field(default_factory=dict)       # (file, line) | None
    instr_calls: dict = field(default_factory=dict)     # list of comp names
    comp_members: dict = field(default_factory=lambda: defaultdict(list))
    instr_bytes: dict = field(default_factory=dict)     # result bytes
    instr_operands: dict = field(default_factory=dict)  # operand instr names


def parse_hlo(hlo_text: str) -> HloIndex:
    idx = HloIndex()
    comp = None
    for raw in hlo_text.splitlines():
        line = raw.rstrip()
        mcomp = _COMP_RE.match(line)
        if mcomp and not raw.startswith(" "):
            comp = mcomp.group(1)
            continue
        if line == "}" and not raw.startswith(" "):
            comp = None
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_txt, opcode = m.group(2), m.group(3), m.group(4)
        idx.instr_op[name] = opcode
        idx.instr_bytes[name] = _shape_bytes(shape_txt)
        # operand names: %refs between the opcode's '(' and any metadata/
        # calls annotation — gives the op's HBM read set (approximate:
        # VMEM-resident reuse isn't visible in HLO text)
        body = line[m.end():]
        body = body.split("metadata=")[0].split("calls=")[0]
        body = body.split("to_apply=")[0]
        idx.instr_operands[name] = re.findall(r"%[\w.\-]+", body)
        msrc = _META_RE.search(line)
        if msrc:
            idx.instr_src[name] = (msrc.group(1), int(msrc.group(2)))
        calls = _CALLS_RE.findall(line) + _TO_APPLY_RE.findall(line)
        if calls:
            idx.instr_calls[name] = calls
        if comp:
            idx.comp_members[comp].append(name)
    return idx


def _expand_sources(idx: HloIndex, instr: str, depth: int = 0):
    """Yield (weight, (file, line)) for an instruction, descending into
    fused/called computations."""
    out = []
    op = idx.instr_op.get(instr, "")
    src = idx.instr_src.get(instr)
    w = _HEAVY.get(op, 1.0)
    if src is not None:
        out.append((w, src))
    if depth < 3:
        for comp in idx.instr_calls.get(instr, []):
            for member in idx.comp_members.get(comp, []):
                mop = idx.instr_op.get(member, "")
                msrc = idx.instr_src.get(member)
                if msrc is not None:
                    out.append((_HEAVY.get(mop, 1.0), msrc))
                # one more level (fusions inside while bodies)
                for c2 in idx.instr_calls.get(member, []):
                    for m2 in idx.comp_members.get(c2, []):
                        s2 = idx.instr_src.get(m2)
                        if s2 is not None:
                            out.append((_HEAVY.get(
                                idx.instr_op.get(m2, ""), 1.0), s2))
    return out


_CLASS_SPANS: dict[str, list[tuple[int, int, str]]] = {}


def _class_spans(path: str) -> list[tuple[int, int, str]]:
    """(start, end, name) line spans of top-level defs/classes in a file —
    keeps phase attribution correct as the source shifts between rounds."""
    if path in _CLASS_SPANS:
        return _CLASS_SPANS[path]
    spans = []
    try:
        with open(path) as f:
            lines = f.readlines()
        starts = [(i + 1, line.split()[1].split("(")[0].rstrip(":"))
                  for i, line in enumerate(lines)
                  if line.startswith(("class ", "def "))]
        for j, (ln, name) in enumerate(starts):
            end = starts[j + 1][0] - 1 if j + 1 < len(starts) else len(lines)
            spans.append((ln, end, name))
    except OSError:
        pass
    _CLASS_SPANS[path] = spans
    return spans


def _span_name(path: str, line: int) -> str | None:
    for s, e, name in _class_spans(path):
        if s <= line <= e:
            return name
    return None


def categorize(src: tuple[str, int] | None) -> str:
    """Map a (source_file, line) to a framework phase."""
    if src is None:
        return "uncategorized"
    f, line = src
    base = os.path.basename(f)
    if base in ("sorting.py", "sampling.py"):
        return "sampling+sort"
    if base == "compositor.py":
        return "composite"
    if base == "embedder.py":
        return "embed"
    if base == "nerfh_nff.py":
        name = _span_name(f, line)
        if name == "FusionNet":
            return "fusion_net"
        if name in ("ExposureMLP", "affine_color_transform"):
            return "exposure"
        return "field_mlp"
    if base in ("dfnet.py", "posenet.py", "mstransformer.py",
                "backbones.py"):
        return "apr_tower"
    if base == "image.py":
        return "resize"
    if base in ("renderer.py", "validation.py"):
        return "render_driver"      # pts/viewdirs construction, reshapes
    if base == "model.py":
        return "model_glue"
    if "/jax/" in f or "/flax/" in f:
        return "jax_internal"
    if base == "losses.py" and "refine" in f:
        return "dfm_loss"
    if base == "ssim.py" or base == "losses.py":
        return "verify_metrics"
    if "optax" in f:
        return "optimizer"
    if base in ("rays.py", "se3.py", "transforms.py", "pose_opt.py",
                "apr_opt.py"):
        return "pose_geom"
    if base in ("fused_field.py", "fused_render.py") or "pallas" in f:
        return "pallas_kernel"
    return "other"


def _op_bytes(idx: HloIndex, name: str) -> int:
    """HBM traffic bound for one executed instruction: result bytes plus
    every distinct operand's bytes (an op must write its output and read
    each operand at least zero and at most once from HBM — reuse out of
    VMEM makes this an UPPER bound, so achieved-GB/s computed from it is
    an upper bound and 'phase runs at the HBM roofline' claims derived
    from it are conservative)."""
    total = idx.instr_bytes.get(name, 0)
    for operand in dict.fromkeys(idx.instr_operands.get(name, ())):
        total += idx.instr_bytes.get(operand, 0)
    return total


def attribute(ops: dict, hlo_text: str, want_bytes: bool = False):
    """ops (from load_xla_ops) + compiled HLO text -> per-phase ms table.

    Each op's time is attributed fractionally across the phases of its
    member instructions (heavy opcodes weighted up). Ops not found in the
    HLO (e.g. runtime copies) land in 'data_movement'.

    With want_bytes=True returns (phases_ms, per_op, phase_bytes) where
    phase_bytes sums each op's result+operand bytes (x its execution
    count) into the op's MAIN phase — dividing by phases_ms gives the
    phase's achieved HBM bandwidth upper bound (see _op_bytes).
    """
    idx = parse_hlo(hlo_text)
    phases: dict[str, float] = defaultdict(float)
    phase_bytes: dict[str, float] = defaultdict(float)
    per_op = []
    for name, rec in ops.items():
        srcs = _expand_sources(idx, name)
        # library frames (jax/flax internals) describe HOW a project op is
        # implemented, not WHAT it is — keep them only when no project
        # source appears among the fusion's members
        proj = [(w, s) for w, s in srcs
                if "nefes_tpu" in s[0] or "/repo/" in s[0]]
        if proj:
            srcs = proj
        opcode = idx.instr_op.get(name, name.strip("%").rstrip("0123456789."))
        if not srcs:
            cat = ("data_movement" if any(
                k in name for k in ("copy", "bitcast", "tuple", "infeed",
                                    "outfeed")) else "uncategorized")
            phases[cat] += rec["ms"]
            phase_bytes[cat] += _op_bytes(idx, name) * rec["count"]
            per_op.append((rec["ms"], name, opcode, cat, rec["count"]))
            continue
        total_w = sum(w for w, _ in srcs)
        cat_w: dict[str, float] = defaultdict(float)
        for w, src in srcs:
            cat_w[categorize(src)] += w
        for cat, w in cat_w.items():
            phases[cat] += rec["ms"] * (w / total_w)
        main_cat = max(cat_w.items(), key=lambda kv: kv[1])[0]
        phase_bytes[main_cat] += _op_bytes(idx, name) * rec["count"]
        per_op.append((rec["ms"], name, opcode, main_cat, rec["count"]))
    per_op.sort(reverse=True)
    phases_sorted = dict(sorted(phases.items(), key=lambda kv: -kv[1]))
    if want_bytes:
        return phases_sorted, per_op, dict(phase_bytes)
    return phases_sorted, per_op
