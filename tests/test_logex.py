"""Logex table-algebra parity with the oracle's Logex on golden tables."""

import io
import os
from contextlib import redirect_stdout

import numpy as np
import pytest

from fastk_tpu.algebra import ParseError, logex_apply, parse_expression
from fastk_tpu.formats.hist import read_histogram
from fastk_tpu.formats.ktab import read_ktab

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
A = os.path.join(GOLDEN, "small_k40", "small")
B = os.path.join(GOLDEN, "small2_k40", "small2")

EXPRS = [
    ("inter", "A &. B", True),
    ("uni", "A |+ B", True),
    ("onlyA", "A - B", True),
    ("sym", "A ^ B", True),
    ("filt", "(A &> B)[5-20]", True),
    ("gcf", "A{40-60}", True),
    ("cnt1", "#A |+ #B", True),
    ("avg", "(A |* B)[2-]", True),
]


@pytest.fixture(scope="module")
def tables():
    return [read_ktab(A), read_ktab(B)]


@pytest.mark.parametrize("name,expr,hist", EXPRS, ids=[e[0] for e in EXPRS])
def test_logex_matches_oracle(tables, name, expr, hist):
    (got_name, got, got_hist), = logex_apply([(name, expr)], tables, (1, 100))
    want = read_ktab(os.path.join(GOLDEN, "logex", name))
    assert np.array_equal(got.packed, want.packed), f"{name}: k-mers differ"
    assert np.array_equal(got.counts, want.counts), f"{name}: counts differ"
    want_hist = read_histogram(os.path.join(GOLDEN, "logex", name))
    assert got_hist == want_hist, f"{name}: histogram differs"


def test_logex_identity(tables):
    """A == (A-B) ∪ (A & B) with left counts (the Vennex cross-check
    invariant, reference Vennex.c:1-8)."""
    results = logex_apply(
        [("x", "(A-B) |. (A &. B)")], tables)
    _, got, _ = results[0]
    a = tables[0]
    assert np.array_equal(got.packed, a.packed)
    assert np.array_equal(got.counts, a.counts)


def test_parse_errors():
    with pytest.raises(ParseError):
        parse_expression("A & B", 2)  # modeless & with counts used
    with pytest.raises(ParseError):
        parse_expression("A &+ C", 2)  # var out of range
    with pytest.raises(ParseError):
        parse_expression("A &+ (B", 2)
    # modeless ok under '#' or with a count filter
    parse_expression("#(A & B)", 2)
    parse_expression("(A & B)[1-5]", 2)


def test_logex_cli(tmp_path):
    from fastk_tpu.tools import logex

    out = str(tmp_path / "res")
    rc = logex.main(["-T2", "-h1:100", f"{out}=A &. B", A + ".ktab", B + ".ktab"])
    assert rc == 0
    got = read_ktab(out)
    want = read_ktab(os.path.join(GOLDEN, "logex", "inter"))
    assert np.array_equal(got.packed, want.packed)
    assert np.array_equal(got.counts, want.counts)
