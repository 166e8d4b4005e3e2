"""Property tests for the hand-rolled RFC-4180 field scanner
(cqlcopy_spark/sources/csv_source._split_rfc4180) against Python's csv
module — the state machine is load-bearing for COPY parity (r04 VERDICT
item 8): every line of every piped load flows through it, and a
disagreement with the standard library's parser would silently corrupt
field values or quote flags.

The alphabet deliberately includes the delimiter, the quote char, and
whitespace; embedded newlines are excluded because the scanner is
line-scoped by contract (Spark's text reader splits lines first — the
same contract as the reference's per-line channel, write.go:121-156).
"""

from __future__ import annotations

import csv
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from cqlcopy_spark.sources.csv_source import _split_rfc4180

# printable-ish field content with a heavy bias toward the metacharacters
_FIELD = st.text(
    alphabet=st.sampled_from(list('",x ;\t\'éλ0')), min_size=0, max_size=12
)
_ROW = st.lists(_FIELD, min_size=1, max_size=6)


def _render_stdlib(row: list[str], quoting: int) -> str:
    buf = io.StringIO()
    csv.writer(buf, lineterminator="", quoting=quoting).writerow(row)
    return buf.getvalue()


@settings(max_examples=300, deadline=None)
@given(_ROW)
def test_parse_agrees_with_stdlib_minimal_quoting(row):
    """parse(stdlib-render) recovers the exact values, and the quoted
    flag is True precisely for the fields the stdlib writer quoted."""
    line = _render_stdlib(row, csv.QUOTE_MINIMAL)
    fields, err = _split_rfc4180(line, len(row))
    assert err is None, (line, err)
    assert [v for v, _ in fields] == row
    # stdlib QUOTE_MINIMAL quotes iff the field contains a metacharacter
    # — except a lone empty field, which it renders as "" so the row
    # isn't an ambiguous empty line
    for (_, quoted), val in zip(fields, row):
        expect = any(c in val for c in ',"\r\n') or row == [""]
        assert quoted == expect, (line, val)


@settings(max_examples=300, deadline=None)
@given(_ROW)
def test_parse_agrees_with_stdlib_quote_all(row):
    """Under QUOTE_ALL every field must come back quoted with the same
    value — the flag carries type intent on the COPY surface (quoted
    "NULL" stays a string), so a flag error is a data error."""
    line = _render_stdlib(row, csv.QUOTE_ALL)
    fields, err = _split_rfc4180(line, len(row))
    assert err is None, (line, err)
    assert [v for v, _ in fields] == row
    assert all(q for _, q in fields), line


@settings(max_examples=300, deadline=None)
@given(_ROW)
def test_parse_matches_csv_reader_on_values(row):
    """Cross-check the VALUES against csv.reader on the same rendered
    line (reader drops the quote flags; values must agree exactly)."""
    line = _render_stdlib(row, csv.QUOTE_MINIMAL)
    fields, err = _split_rfc4180(line, len(row))
    assert err is None
    rd = next(csv.reader(io.StringIO(line)), [""])
    # csv.reader represents the empty line as [] while a 1-field empty
    # row renders to "" — normalize the stdlib side the way the COPY
    # surface does (one empty unquoted field)
    if line == "":
        rd = [""]
    assert [v for v, _ in fields] == rd


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list('",x ')), min_size=0, max_size=24))
def test_arbitrary_line_never_crashes_and_errors_are_honest(line):
    """Fuzz raw lines: the scanner must never raise, and whenever it
    reports NO error for an arity-matching parse, csv.reader must agree
    on the values (an unflagged divergence is silent corruption; flagged
    rows go to the parse-error budget, which is allowed to be stricter
    than the stdlib — e.g. bare quotes inside unquoted fields)."""
    ncols = line.count(",") + 1  # upper bound when no quoting involved
    fields, err = _split_rfc4180(line, ncols)
    if err is None:
        rd = next(csv.reader(io.StringIO(line)), [""])
        if line == "":
            rd = [""]
        # csv.reader is lenient about bare '"' inside unquoted fields in
        # ways RFC 4180 forbids; only compare when the line is RFC-clean
        rfc_clean = all(
            ('"' not in v) or q for v, q in fields
        )
        if rfc_clean and len(rd) == ncols:
            assert [v for v, _ in fields] == rd, line
