"""One-shot extraction of public dataset label metadata (ADE20K class names,
KITTI-360 label set — standard published constants) from the reference's
apps/utils into a compact Python data module."""
import ast
import re

SEM = "/root/reference/mrhash/apps/utils/semantic_segmentation.py"
LAB = "/root/reference/mrhash/apps/utils/labels.py"
DST = "/root/repo/mrhash_tpu/apps/utils/labels.py"

sem = open(SEM).read()
lab = open(LAB).read()

# ade20k_classes dict
m = re.search(r"ade20k_classes\s*=\s*\{(.*?)\n\}", sem, re.S)
classes = {}
for num, name in re.findall(r"(\d+)\s*:\s*\"([^\"]+)\"", m.group(1)):
    classes[int(num)] = name

# kitti_360 labels: Label("name", id, kittiId, trainId, "category", catId,
# hasInstances, ignoreInEval, ignoreInInst, color)
rows = re.findall(
    r"Label\(\s*'([^']+)'\s*,\s*(-?\d+)\s*,\s*(-?\d+)\s*,\s*(-?\d+)\s*,"
    r"\s*'([^']+)'\s*,\s*(-?\d+)\s*,\s*(True|False)\s*,\s*(True|False)\s*,"
    r"\s*(True|False)\s*,\s*\(([^)]*)\)", lab)
print("ade20k classes:", len(classes), "kitti labels:", len(rows))

with open(DST, "w") as f:
    f.write('"""Public dataset label metadata: ADE20K class names and the\n')
    f.write('KITTI-360 label set (standard published constants; same data the\n')
    f.write('reference vendors in apps/utils/{semantic_segmentation,labels}.py).\n')
    f.write('"""\nfrom collections import namedtuple\n\n')
    f.write("Label = namedtuple(\"Label\", [\"name\", \"id\", \"kittiId\", "
            "\"trainId\", \"category\",\n                   \"categoryId\", "
            "\"hasInstances\", \"ignoreInEval\",\n                   "
            "\"ignoreInInst\", \"color\"])\n\n")
    f.write("ADE20K_CLASSES = {\n")
    for k, v in sorted(classes.items()):
        f.write(f"    {k}: {v!r},\n")
    f.write("}\n\nKITTI_360_LABELS = [\n")
    for r in rows:
        name, i, ki, ti, cat, ci, hi, ie, ii, col = r
        col = tuple(int(x) for x in col.split(","))
        f.write(f"    Label({name!r}, {i}, {ki}, {ti}, {cat!r}, {ci}, "
                f"{hi}, {ie}, {ii}, {col}),\n")
    f.write("]\n")
print("wrote", DST)
