"""The reference-exact mapQual sort: native (actual libstdc++ std::sort)
vs the Python replica of the libstdc++ 12 introsort must produce the
identical permutation on tie-heavy inputs of every size class (insertion
regime <=16, quicksort regime, heap-fallback regime)."""

import numpy as np
import pytest

from dindel_tpu.engine.std_sort import (_native, introsort_order_py,
                                        mapqual_sort_order)


def test_native_available():
    assert _native() is not None, "libdindel_stdsort.so failed to build"


@pytest.mark.parametrize("n", [0, 1, 2, 15, 16, 17, 50, 257, 1024, 5000])
def test_py_matches_native(n):
    lib = _native()
    if lib is None:
        pytest.skip("no native stdsort")
    rng = np.random.RandomState(n + 1)
    for trial in range(6):
        if trial % 3 == 0:
            keys = np.full(n, 0.999)  # all ties
        elif trial % 3 == 1:
            keys = rng.choice([0.9, 0.99, 0.999], size=n)  # few classes
        else:
            keys = rng.rand(n)
        out = np.empty(n, np.int32)
        lib.dsort_mapqual_desc(n, np.ascontiguousarray(keys), out)
        got = introsort_order_py(keys)
        assert list(out) == list(got), (n, trial)


def test_order_is_sorted_descending():
    rng = np.random.RandomState(0)
    keys = rng.choice([0.9, 0.99, -1.0], size=777)
    p = mapqual_sort_order(keys)
    s = keys[p]
    assert (np.diff(s) <= 0).all()
    assert sorted(p) == list(range(777))
