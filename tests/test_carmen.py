"""CARMEN parser round-trip on generated logs (real datasets absent on this
machine — SURVEY.md §0; format per CARMEN logger docs)."""

import numpy as np

from ndtpu.data import carmen
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def _fake_log(t=5, n=181):
    rng = np.random.default_rng(0)
    odom = np.cumsum(rng.normal(0, 0.1, (t, 3)), axis=0)
    return carmen.CarmenLog(
        ranges=rng.uniform(0.5, 20.0, (t, n)).astype(np.float32),
        n_beams=np.full(t, n, np.int32),
        # Center-mounted laser: laser pose == robot pose (to_sequence now
        # applies the relative transform as mounting extrinsics).
        laser_pose=odom.copy(),
        odom_pose=odom,
        timestamps=np.arange(t, dtype=np.float64),
    )


def test_roundtrip(tmp_path):
    log = _fake_log()
    p = str(tmp_path / "fake.clf")
    carmen.write_carmen(p, log)
    back = carmen.read_carmen(p)
    np.testing.assert_allclose(back.ranges, log.ranges, atol=1e-3)
    np.testing.assert_array_equal(back.n_beams, log.n_beams)
    np.testing.assert_allclose(back.odom_pose, log.odom_pose, atol=1e-6)


def test_to_sequence_geometry(tmp_path):
    log = _fake_log(t=3, n=181)
    pts, mask, odom = carmen.to_sequence(log, fov=np.pi, max_range=25.0)
    assert pts.shape == (3, 181, 2)
    assert mask.shape == (3, 181)
    # Beam 0 at -90 deg: x ~ 0, y = -r. Middle beam at 0 deg: y ~ 0.
    r0 = log.ranges[0, 0]
    np.testing.assert_allclose(pts[0, 0], [0.0, -r0], atol=1e-4)
    mid = 90
    rm = log.ranges[0, mid]
    np.testing.assert_allclose(pts[0, mid], [rm, 0.0], atol=1e-4)
    # odom[0] is identity; others are finite relative motions.
    np.testing.assert_array_equal(odom[0], 0.0)
    assert np.all(np.isfinite(odom))


def test_mixed_beam_counts(tmp_path):
    log = _fake_log(t=2, n=181)
    log = log._replace(n_beams=np.asarray([181, 180], np.int32))
    p = str(tmp_path / "mixed.clf")
    carmen.write_carmen(p, log)
    back = carmen.read_carmen(p)
    assert back.ranges.shape[1] == 181
    pts, mask, _ = carmen.to_sequence(back)
    assert not mask[1, 180]  # padded beam masked out


def test_robotlaser1_real_world_line(tmp_path):
    """Hand-written ROBOTLASER1 lines following the CARMEN logger spec
    (not produced by our own writer): remission block, full trailer with
    tv/rv/safety fields, timestamp, hostname, logger timestamp."""
    import math

    n = 5
    readings = "1.10 2.20 3.30 4.40 5.50"
    line = (f"ROBOTLASER1 0 -1.570796 3.141593 0.785398 50.0 0.01 0 {n} "
            f"{readings} 2 10.0 20.0 "           # 2 remission values
            "1.0 2.0 0.5 0.9 1.9 0.48 "          # laser pose, robot pose
            "0.25 0.05 0.4 0.3 0.2 "             # tv rv fwd side axis
            "1191.521 odin 1191.600\n")
    p = tmp_path / "rl.log"
    p.write_text("# comment\n" + line + line)
    log = carmen.read_carmen(str(p))
    assert log.ranges.shape == (2, 5)
    np.testing.assert_allclose(log.ranges[0], [1.1, 2.2, 3.3, 4.4, 5.5],
                               rtol=1e-6)
    np.testing.assert_allclose(log.laser_pose[0], [1.0, 2.0, 0.5])
    np.testing.assert_allclose(log.odom_pose[0], [0.9, 1.9, 0.48])
    assert abs(log.timestamps[0] - 1191.521) < 1e-6
    assert abs(log.start_angle - (-1.570796)) < 1e-6
    assert abs(log.fov - 3.141593) < 1e-6
    assert abs(log.log_max_range - 50.0) < 1e-6

    # to_sequence picks angles up from the metadata (check in the raw
    # laser frame: this fixture has a nontrivial mounting offset, which
    # to_sequence now applies by default).
    pts, mask, odom = carmen.to_sequence(log, apply_laser_extrinsics=False)
    ang0 = math.atan2(pts[0, 0, 1], pts[0, 0, 0])
    assert abs(ang0 - (-math.pi / 2)) < 1e-5


def test_robotlaser1_without_remission_block(tmp_path):
    """Dialects that omit the remission count entirely still parse (the
    probe sees a float where the int count would be)."""
    line = ("ROBOTLASER1 0 -1.5708 3.1416 1.5708 30.0 0.01 0 3 "
            "1.0 2.0 3.0 "
            "5.5 6.5 0.1 5.4 6.4 0.09 "
            "0.0 0.0 0.0 0.0 0.0 77.5 host 77.6\n")
    p = tmp_path / "rl2.log"
    p.write_text(line)
    log = carmen.read_carmen(str(p))
    assert log.ranges.shape[0] == 1
    np.testing.assert_allclose(log.laser_pose[0], [5.5, 6.5, 0.1])
    # Without the remission block the trailer alignment shifts; timestamp
    # probing must not crash (it may land on a safety field or 0).
    assert np.isfinite(log.timestamps[0])


def test_malformed_lines_are_skipped_with_warning(tmp_path):
    good = "FLASER 3 1.0 2.0 3.0 0.1 0.2 0.05 0.1 0.2 0.05 12.5 host 12.6\n"
    bad = "FLASER 99 1.0 2.0\n"          # truncated readings
    p = tmp_path / "mix.log"
    p.write_text(bad + good + "ODOM 1 2 3\n")
    import warnings as w
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        log = carmen.read_carmen(str(p))
    assert log.ranges.shape[0] == 1
    assert any("malformed" in str(r.message) for r in rec)


def test_native_parses_robotlaser1_like_python(tmp_path):
    from ndtpu import native

    if not native.ndtpu_native_available():
        import pytest
        pytest.skip("native library unavailable")
    n = 4
    line = (f"ROBOTLASER1 0 -1.570796 3.141593 1.0472 50.0 0.01 0 {n} "
            "1.5 2.5 3.5 4.5 0 "
            "1.0 2.0 0.5 0.9 1.9 0.48 "
            "0.25 0.05 0.4 0.3 0.2 "
            "1191.521 odin 1191.600\n")
    p = tmp_path / "rl3.log"
    p.write_text(line * 3)
    py = carmen.read_carmen(str(p))
    nat = native.parse_carmen_native(str(p))
    np.testing.assert_allclose(nat.ranges, py.ranges)
    np.testing.assert_allclose(nat.laser_pose, py.laser_pose)
    np.testing.assert_allclose(nat.odom_pose, py.odom_pose)
    np.testing.assert_allclose(nat.timestamps, py.timestamps)
    assert abs(nat.start_angle - py.start_angle) < 1e-9
    assert abs(nat.fov - py.fov) < 1e-9


def test_writer_robotlaser_roundtrip(tmp_path):
    log = carmen.CarmenLog(
        ranges=np.asarray([[1.0, 2.0, 3.0]], np.float32),
        n_beams=np.asarray([3], np.int32),
        laser_pose=np.asarray([[0.5, 0.6, 0.1]]),
        odom_pose=np.asarray([[0.4, 0.5, 0.09]]),
        timestamps=np.asarray([5.5]),
        start_angle=-np.pi / 2, fov=np.pi, log_max_range=30.0)
    p = tmp_path / "w.log"
    carmen.write_carmen(str(p), log, style="robotlaser")
    back = carmen.read_carmen(str(p))
    np.testing.assert_allclose(back.ranges[0], log.ranges[0], atol=1e-3)
    np.testing.assert_allclose(back.odom_pose, log.odom_pose, atol=1e-6)
    assert abs(back.timestamps[0] - 5.5) < 1e-6
    assert abs(back.fov - np.pi) < 1e-5


def test_robotlaser1_integer_laser_x_without_remission(tmp_path):
    """ADVICE r3: a writer printing laser_x as an INTEGER ("0") with no
    remission block must not be misread as a remission count (which would
    swallow pose fields). Disambiguated by total token count."""
    line = ("ROBOTLASER1 0 -1.5708 3.1416 1.5708 30.0 0.01 0 3 "
            "1.0 2.0 3.0 "
            "0 6.5 0.1 -0.25 6.4 0.09 "
            "0.0 0.0 0.0 0.0 0.0 77.5 host 77.6\n")
    p = tmp_path / "rl4.log"
    p.write_text(line)
    log = carmen.read_carmen(str(p))
    assert log.ranges.shape[0] == 1
    np.testing.assert_allclose(log.laser_pose[0], [0.0, 6.5, 0.1])
    np.testing.assert_allclose(log.odom_pose[0], [-0.25, 6.4, 0.09])
    np.testing.assert_allclose(log.timestamps[0], 77.5)

    from ndtpu import native
    if native.ndtpu_native_available():
        nat = native.parse_carmen_native(str(p))
        np.testing.assert_allclose(nat.laser_pose, log.laser_pose)
        np.testing.assert_allclose(nat.odom_pose, log.odom_pose)
        np.testing.assert_allclose(nat.timestamps, log.timestamps)


def test_native_no_remission_block_like_python(tmp_path):
    """ADVICE r3 (medium): the native parser must mirror the Python
    no-remission probe instead of unconditionally consuming a count."""
    from ndtpu import native
    if not native.ndtpu_native_available():
        import pytest
        pytest.skip("native library unavailable")
    line = ("ROBOTLASER1 0 -1.5708 3.1416 1.5708 30.0 0.01 0 3 "
            "1.0 2.0 3.0 "
            "5.5 6.5 0.1 5.4 6.4 0.09 "
            "0.0 0.0 0.0 0.0 0.0 77.5 host 77.6\n")
    p = tmp_path / "rl5.log"
    p.write_text(line * 2)
    py = carmen.read_carmen(str(p))
    nat = native.parse_carmen_native(str(p))
    np.testing.assert_allclose(nat.ranges, py.ranges)
    np.testing.assert_allclose(nat.laser_pose, py.laser_pose)
    np.testing.assert_allclose(nat.odom_pose, py.odom_pose)


def test_to_sequence_applies_laser_extrinsics(tmp_path):
    """VERDICT r3: a laser mounted 0.3 m forward of the robot origin must
    shift scan points +0.3 m in robot-frame x (to_sequence previously
    dropped laser_pose entirely)."""
    lines = []
    for k in range(2):
        op = (1.0 * k, 0.0, 0.0)
        lp = (1.0 * k + 0.3, 0.0, 0.0)          # laser 0.3 m ahead
        lines.append(
            f"FLASER 3 2.0 2.0 2.0 {lp[0]} {lp[1]} {lp[2]} "
            f"{op[0]} {op[1]} {op[2]} {10.0 + k} host 0.0\n")
    p = tmp_path / "ext.log"
    p.write_text("".join(lines))
    log = carmen.read_carmen(str(p))
    pts, mask, odom = carmen.to_sequence(log, max_range=50.0)
    pts_raw, _, _ = carmen.to_sequence(log, max_range=50.0,
                                       apply_laser_extrinsics=False)
    np.testing.assert_allclose(pts[..., 0], pts_raw[..., 0] + 0.3,
                               atol=1e-6)
    np.testing.assert_allclose(pts[..., 1], pts_raw[..., 1], atol=1e-6)
    # odometry deltas stay robot-frame
    np.testing.assert_allclose(odom[1], [1.0, 0.0, 0.0], atol=1e-9)
