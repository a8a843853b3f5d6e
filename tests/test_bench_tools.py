"""Pins for the bench/gate diagnostic harnesses' shared plumbing.

Round-15 advisor: `dict(zip(("cpu","io","py"), spec.split(",")))`
silently truncated — a malformed `--gate-band 0.30,0.62` produced a
2-key band and the all() gate quietly checked only two canaries. Both
harnesses now validate the arity and fail loudly.
"""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("mod", ["bench_ab", "scale_lsh_gate"])
def test_gate_band_requires_exactly_three_values(mod):
    m = __import__(mod)
    assert m._parse_band("0.30,0.62,1.10") == {
        "cpu": 0.30,
        "io": 0.62,
        "py": 1.10,
    }
    for bad in ("0.30,0.62", "0.30", "1,2,3,4", ""):
        with pytest.raises(SystemExit):
            m._parse_band(bad)
