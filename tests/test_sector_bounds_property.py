"""Property test: sector tap bounds always contain the true sample taps.

The sector renderer's correctness rests on one invariant: for any pose in
the live-agent envelope and any heading, every bilinear tap of every sample
falls inside its piece's static [row_lo, row_lo+n_rows) x [col_lo,
col_lo+n_cols) window slice — then the in-kernel clip is a no-op and the
sector output equals exact bilinear sampling. This pins it across random
sensor geometries (the unit tests only cover the two BASELINE sensors).
"""

import dataclasses

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from navdv_tpu.config import SensorConfig
from navdv_tpu.sensor import polar_offsets, sector_bounds, window_size


@settings(max_examples=40, deadline=None)
@given(
    n_radial=st.integers(2, 12),
    azu=st.sampled_from([(24, 1), (24, 3), (16, 2), (40, 1), (8, 5)]),
    r_min=st.floats(1.0, 4.0),
    r_span=st.floats(1.0, 8.0),
    n_sectors=st.sampled_from([4, 8]),
    ring_blocks=st.integers(1, 3),
    theta=st.floats(-12.0, 12.0),
    frac_x=st.floats(0.0, 0.999),
    frac_y=st.floats(0.0, 0.999),
)
def test_bounds_contain_all_taps(
    n_radial, azu, r_min, r_span, n_sectors, ring_blocks, theta, frac_x, frac_y
):
    n_azimuth, az_upsample = azu
    sensor = SensorConfig(
        n_radial=n_radial,
        n_azimuth=n_azimuth,
        az_upsample=az_upsample,
        r_min=r_min,
        r_max=r_min + r_span,
    )
    a = sensor.n_fine
    if a % n_sectors:
        return  # sector_bounds raises for non-divisible grids (tested below)
    dx0, dy0 = polar_offsets(sensor)
    wsz = window_size(sensor)
    half = wsz // 2
    binw = sensor.bin_width
    # the renderer's decomposition: theta = k*binw + phi, |phi| <= binw/2
    k = np.round(theta / binw)
    phi = theta - k * binw
    assert abs(phi) <= binw / 2 + 1e-9
    c, s = np.cos(phi), np.sin(phi)
    xs = frac_x + half + c * dx0 - s * dy0  # [R, A]
    ys = frac_y + half + s * dx0 + c * dy0
    a_s = a // n_sectors
    for i, (ring_lo, n_rings, row_lo, n_rows, col_lo, n_cols) in enumerate(
        sector_bounds(sensor, n_sectors, ring_blocks)
    ):
        si = i % n_sectors
        sub_x = xs[ring_lo : ring_lo + n_rings, si * a_s : (si + 1) * a_s]
        sub_y = ys[ring_lo : ring_lo + n_rings, si * a_s : (si + 1) * a_s]
        # both hat taps (floor, floor+1) of every sample stay in the slice
        # [lo, lo + n): max tap index floor(x)+1 must be <= lo + n - 1
        assert np.floor(sub_x).min() >= col_lo
        assert np.floor(sub_x).max() + 1 <= col_lo + n_cols - 1
        assert np.floor(sub_y).min() >= row_lo
        assert np.floor(sub_y).max() + 1 <= row_lo + n_rows - 1


def test_indivisible_sector_count_raises():
    with pytest.raises(ValueError, match="divisible"):
        sector_bounds(SensorConfig(n_azimuth=24, az_upsample=1), 7)
