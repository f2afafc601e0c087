"""Native C++ kernels vs their NumPy fallbacks."""

import numpy as np
import pytest

from pcgmix_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no g++ toolchain / native build failed")
    return True


def _sampen_numpy(y, order, r):
    n = len(y)
    tm = np.lib.stride_tricks.sliding_window_view(y, order)[: n - order]
    tm1 = np.lib.stride_tricks.sliding_window_view(y, order + 1)
    b = a = 0
    for i in range(len(tm) - 1):
        b += int(np.sum(np.max(np.abs(tm[i + 1 :] - tm[i]), axis=1) < r))
        a += int(np.sum(np.max(np.abs(tm1[i + 1 :] - tm1[i]), axis=1) < r))
    if a == 0 or b == 0:
        return np.nan
    return -np.log(a / b)


def test_sample_entropy_matches_numpy(lib_ok, rng):
    for n in (50, 200, 400):
        y = rng.normal(size=n)
        r = 0.2 * np.std(y)
        got = native.sample_entropy(y, 2, r)
        exp = _sampen_numpy(y, 2, r)
        if np.isnan(exp):  # too few matches: both sides must agree it's NaN
            assert np.isnan(got)
        else:
            assert got == pytest.approx(exp, rel=1e-12)


def test_opt_disp_env_matches_numpy(lib_ok, rng):
    from numpy.lib.stride_tricks import sliding_window_view

    for _ in range(10):
        n1 = int(rng.integers(50, 200))
        n2 = int(rng.integers(10, n1))
        s1 = rng.random(n1)
        s2 = rng.random(n2)
        windows = sliding_window_view(s1, n2)
        total = (
            s1.sum() - windows.sum(axis=1)
            + np.maximum(windows, s2[None, :]).sum(axis=1)
        )
        assert native.opt_disp_env(s1, s2) == int(np.argmax(total))


def test_dispatch_through_dsp(lib_ok, rng):
    """classical.dsp.sample_entropy routes through the native kernel."""
    from pcgmix_tpu.classical import dsp

    y = rng.normal(size=300)
    v = dsp.sample_entropy(y)
    assert np.isfinite(v)
    r = 0.2 * np.std(y)
    assert v == pytest.approx(_sampen_numpy(np.asarray(y, np.float64), 2, r),
                              rel=1e-10)
