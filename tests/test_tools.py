"""Unit tests for the measurement tooling in tools/."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from topup_points import merge_point  # noqa: E402


def _pt(snr, fe, frames):
    return {"snr_db": snr, "fe": fe, "frames": frames,
            "ber": 1e-7, "fer": 1e-5, "be": 10 * fe}


class TestMergePoint:
    def test_inserts_new_snr_sorted(self):
        pts = [_pt(1.0, 50, 1000), _pt(2.0, 20, 5000)]
        assert merge_point(pts, _pt(1.5, 30, 2000))
        assert [p["snr_db"] for p in pts] == [1.0, 1.5, 2.0]

    def test_replaces_when_more_frame_errors(self):
        pts = [_pt(2.5, 25, 897_024)]
        assert merge_point(pts, _pt(2.5, 100, 4_685_824))
        assert pts[0]["fe"] == 100

    def test_never_regresses_on_truncated_rerun(self):
        # the exact failure this guard exists for: an interrupted or
        # wall-capped re-run must not overwrite better statistics
        pts = [_pt(2.5, 25, 897_024)]
        assert not merge_point(pts, _pt(2.5, 4, 245_760))
        assert pts[0]["fe"] == 25 and pts[0]["frames"] == 897_024

    def test_tie_on_fe_broken_by_frames(self):
        pts = [_pt(2.5, 25, 897_024)]
        assert merge_point(pts, _pt(2.5, 25, 1_000_000))
        assert pts[0]["frames"] == 1_000_000
        assert not merge_point(pts, _pt(2.5, 25, 500_000))
        assert pts[0]["frames"] == 1_000_000
