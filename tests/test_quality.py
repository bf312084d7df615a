"""End-to-end reconstruction quality thresholds (VERDICT r1 item 6): the
small preset of tools/quality_eval.py (box room, 5 cm voxels, full orbit)
must hold Chamfer-L1 and F-score bounds vs the analytic room surface.
Calibrated: Chamfer-L1 ~= 0.018 m, F-score@5cm ~= 0.993 on this protocol
(Replica preset on the real device measures 5.2 mm / 1.000 — QUALITY.json).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_box_room_quality_small():
    from quality_eval import run_quality
    rows = run_quality(frames=12, res="small", n_eval_points=100_000,
                       mesh_path="/tmp/quality_mesh_test.ply",
                       write_json=False)
    r5 = next(r for r in rows if r["threshold"] == 0.05)
    # tight gates (round-2 VERDICT item 7): the calibrated protocol measures
    # 0.018 m / 0.993 / 0.997 — these bounds fail on a <1.4x regression
    # instead of the old 2x-slack 0.035 / 0.90 thresholds
    assert r5["chamfer_l1"] < 0.025, r5
    assert r5["fscore"] > 0.97, r5
    assert r5["precision"] > 0.97, r5


def test_clutter_room_quality_small_multires():
    """Cluttered scene (oblique boxes/spheres/ramp, quality_eval
    CLUTTER_OBJECTS) with variance coarsening ON: exercises depth
    discontinuities in the tile allocator and the mixed-resolution
    boundary meshing (D1/D5/D6) that the empty box room never hits.
    Calibrated on this protocol: Chamfer 0.0254 m / F 0.876 / P 0.901
    @5cm with coarsening on (single-res sweep extract measures
    0.0246 / 0.930 — the recall drop is the coarse-region meshing)."""
    from quality_eval import run_quality
    rows = run_quality(frames=12, res="small", n_eval_points=100_000,
                       mesh_path="/tmp/quality_mesh_clutter.ply",
                       write_json=False, scene="clutter", multires=True,
                       extract_mode="resident")
    r5 = next(r for r in rows if r["threshold"] == 0.05)
    assert r5["chamfer_l1"] < 0.030, r5
    assert r5["fscore"] > 0.85, r5
    assert r5["precision"] > 0.87, r5
