"""Native C++ components: parser parity with the Python parser, ordering
validity + bandwidth reduction."""

import numpy as np
import pytest

from ndtpu import native
from ndtpu.data import carmen

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def have_native():
    if not native.ndtpu_native_available():
        pytest.skip("native toolchain unavailable")


def test_carmen_native_matches_python(tmp_path, have_native):
    rng = np.random.default_rng(0)
    t, n = 7, 181
    log = carmen.CarmenLog(
        ranges=rng.uniform(0.5, 20.0, (t, n)).astype(np.float32),
        n_beams=np.full(t, n, np.int32),
        laser_pose=rng.normal(0, 1, (t, 3)),
        odom_pose=np.cumsum(rng.normal(0, 0.1, (t, 3)), axis=0),
        timestamps=np.arange(t, dtype=np.float64),
    )
    p = str(tmp_path / "log.clf")
    carmen.write_carmen(p, log)
    py = carmen.read_carmen(p)
    cc = native.parse_carmen_native(p)
    np.testing.assert_allclose(cc.ranges, py.ranges, atol=1e-4)
    np.testing.assert_array_equal(cc.n_beams, py.n_beams)
    np.testing.assert_allclose(cc.odom_pose, py.odom_pose, atol=1e-9)
    np.testing.assert_allclose(cc.timestamps, py.timestamps, atol=1e-9)


def _bandwidth(order, ei, ej):
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    return int(np.max(np.abs(pos[ei] - pos[ej])))


def test_rcm_reduces_bandwidth(have_native):
    rng = np.random.default_rng(1)
    v = 200
    # Chain + random long-range edges, then scrambled labels.
    perm = rng.permutation(v)
    ei = perm[np.arange(v - 1)]
    ej = perm[np.arange(1, v)]
    extra = rng.integers(0, v, (30, 2))
    ei = np.concatenate([ei, perm[extra[:, 0]]]).astype(np.int32)
    ej = np.concatenate([ej, perm[extra[:, 1]]]).astype(np.int32)

    order = native.rcm_order(ei, ej, v)
    assert sorted(order.tolist()) == list(range(v))  # a permutation
    assert _bandwidth(order, ei, ej) < _bandwidth(np.arange(v), ei, ej)


def test_amd_is_permutation(have_native):
    rng = np.random.default_rng(2)
    v = 120
    ei = rng.integers(0, v, 400).astype(np.int32)
    ej = rng.integers(0, v, 400).astype(np.int32)
    order = native.amd_order(ei, ej, v)
    assert sorted(order.tolist()) == list(range(v))
