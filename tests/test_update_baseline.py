"""The one-command BASELINE.md regenerator's patch machinery (no TPU runs)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from update_baseline import headline_md, patch, stress_md  # noqa: E402


def test_patch_replaces_only_marked_block():
    md = (
        "# title\nkeep me\n"
        "<!-- begin:auto-x -->\nOLD CONTENT\n<!-- end:auto-x -->\n"
        "tail stays\n"
    )
    out = patch(md, "x", "NEW\nLINES")
    assert "OLD CONTENT" not in out
    assert "NEW\nLINES" in out
    assert out.startswith("# title\nkeep me\n")
    assert out.endswith("tail stays\n")
    # idempotent: patching again with the same body is stable
    assert patch(out, "x", "NEW\nLINES") == out


def test_patch_missing_marker_raises():
    with pytest.raises(SystemExit):
        patch("no markers here", "x", "body")


def test_headline_and_stress_render():
    bench = {
        "value": 22_060_302,
        "vs_baseline": 26.18,
        "extra": {
            "frames_per_s": 861.7,
            "frame_ms": 1.16,
            "batch": 8,
            "n_chain": 16,
            "single_frame_ms": 55.4,
            "frame_ms_wall_batched": 1.37,
            "single_frame_device_ms": 1.41,
            "ircad_hd_triangles": 123224,
            "ircad_hd_rays_per_s": 8_876_419,
            "ircad_hd_frame_ms": 2.88,
            "ircad_hd_frame_device_ms": 3.17,
        },
    }
    md = headline_md(bench)
    assert "22,060,302" in md and "26.18x" in md and "123,224" in md

    rows = [
        {"tris": 200000, "rays": "fan", "brute": 24.0,
         "listed-exact": 0.324, "listed-hier": 0.289},
        {"tris": 1000000, "rays": "fan", "listed-exact": 0.702,
         "listed-hier": 0.563},
    ]
    md = stress_md(rows)
    assert "200,000" in md and "83x" in md  # 24.0/0.289 rounds to 83x
    assert "1,000,000" in md  # rows without brute render with placeholders
