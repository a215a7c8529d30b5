"""CARMEN parser round-trip on generated logs (real datasets absent on this
machine — SURVEY.md §0; format per CARMEN logger docs)."""

import numpy as np

from ndtpu.data import carmen


def _fake_log(t=5, n=181):
    rng = np.random.default_rng(0)
    return carmen.CarmenLog(
        ranges=rng.uniform(0.5, 20.0, (t, n)).astype(np.float32),
        n_beams=np.full(t, n, np.int32),
        laser_pose=rng.normal(0, 1, (t, 3)),
        odom_pose=np.cumsum(rng.normal(0, 0.1, (t, 3)), axis=0),
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
