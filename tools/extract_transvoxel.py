"""One-shot extraction of the public Transvoxel tables (Eric Lengyel, transvoxel.org)
from the reference params.h into a Python data module.

These are published algorithm constants, not reference-specific code.
"""
import re

SRC = "/root/reference/mrhash/src/sdf/params.h"
DST = "/root/repo/mrhash_tpu/ops/transvoxel.py"

text = open(SRC).read()

# regularCellClass: 256 bytes
m = re.search(r"regularCellClass\[256\]\s*=\s*\{(.*?)\};", text, re.S)
cell_class = [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F]+|\d+", m.group(1))]
assert len(cell_class) == 256, len(cell_class)

# regularCellData[16]: each entry { 0xGV, { idx... } }
m = re.search(r"regularCellData\[16\]\s*=\s*\{(.*?)\};", text, re.S)
entries = re.findall(r"\{\s*(0x[0-9a-fA-F]+)\s*,\s*\{([^}]*)\}\s*\}", m.group(1))
assert len(entries) == 16, len(entries)
cell_data_gv = []
cell_data_idx = []
for gv, idxs in entries:
    gv = int(gv, 0)
    vals = [int(x) for x in re.findall(r"\d+", idxs)]
    vals += [0] * (15 - len(vals))
    cell_data_gv.append(gv)
    cell_data_idx.append(vals)

# regularVertexData[256][12] of uint16
m = re.search(r"regularVertexData\[256\]\[12\]\s*=\s*\{(.*?)\};", text, re.S)
rows = re.findall(r"\{([^{}]*)\}", m.group(1))
assert len(rows) == 256, len(rows)
vertex_data = []
for r in rows:
    vals = [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F]+|\d+", r)]
    vals += [0] * (12 - len(vals))
    assert len(vals) == 12
    vertex_data.append(vals)


def fmt(lst, per_line=16):
    out = []
    for i in range(0, len(lst), per_line):
        out.append("    " + ", ".join(str(v) for v in lst[i : i + per_line]) + ",")
    return "\n".join(out)


with open(DST, "w") as f:
    f.write('"""Transvoxel marching-cubes lookup tables.\n\n')
    f.write("Published algorithm data (C) 2009 Eric Lengyel, https://transvoxel.org/ .\n")
    f.write("Same tables the reference embeds in mrhash/src/sdf/params.h:98-435.\n")
    f.write("Stored as plain lists; mrhash_tpu.ops.meshing loads them as jnp constants.\n")
    f.write('"""\n\n')
    f.write("# Equivalence-class index for each of the 256 corner-sign cases.\n")
    f.write("REGULAR_CELL_CLASS = [\n%s\n]\n\n" % fmt(cell_class))
    f.write("# Per-class geometry counts: high nibble = vertex count, low nibble = triangle count.\n")
    f.write("REGULAR_CELL_GEOMETRY = [\n%s\n]\n\n" % fmt(cell_data_gv))
    f.write("# Per-class triangle vertex indices (up to 5 triangles = 15 indices, zero-padded).\n")
    f.write("REGULAR_CELL_VERTEX_INDEX = [\n")
    for vals in cell_data_idx:
        f.write("    [%s],\n" % ", ".join(str(v) for v in vals))
    f.write("]\n\n")
    f.write("# Per-case edge codes: low byte = corner-pair code of the edge each vertex lies on.\n")
    f.write("REGULAR_VERTEX_DATA = [\n")
    for vals in vertex_data:
        f.write("    [%s],\n" % ", ".join(hex(v) for v in vals))
    f.write("]\n")

print("wrote", DST, len(cell_class), len(cell_data_gv), len(vertex_data))
