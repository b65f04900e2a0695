"""<table> structure extraction: semantics pinned against hand-built HTML.

Covers the contract documented on _TableParser: nested tables emitted
inner-first without leaking cells into the parent, inline markup stripped,
charrefs decoded, whitespace folded, ragged/implicit rows, truncated
markup flushed at EOF.
"""

from hoover_snoop2_spark.operators.html_extract import extract_tables


def test_basic_table_with_header():
    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>1</td></tr></table>"
    )
    assert extract_tables(html) == [[["k", "v"], ["a", "1"]]]


def test_inline_markup_stripped_and_charrefs_decoded():
    html = "<table><tr><td><b>bold</b> &amp; <i>x</i></td></tr></table>"
    assert extract_tables(html) == [[["bold & x"]]]


def test_whitespace_folded():
    html = "<table><tr><td>  a\n\t b  </td></tr></table>"
    assert extract_tables(html) == [[["a b"]]]


def test_text_outside_cells_ignored():
    html = "<p>before</p><table>noise<tr>gap<td>a</td></tr></table><p>after</p>"
    assert extract_tables(html) == [[["a"]]]


def test_nested_table_inner_first_no_leak():
    html = (
        "<table><tr><td>outer1"
        "<table><tr><td>inner</td></tr></table>"
        "</td><td>outer2</td></tr></table>"
    )
    assert extract_tables(html) == [
        [["inner"]],
        [["outer1", "outer2"]],
    ]


def test_ragged_rows_and_unclosed_cells():
    # missing </td>/</tr>: next <td>/<tr> implicitly closes the previous
    html = "<table><tr><td>a<td>b<tr><td>c</table>"
    assert extract_tables(html) == [[["a", "b"], ["c"]]]


def test_implicit_row_for_cell_outside_tr():
    html = "<table><td>a</td><td>b</td></table>"
    assert extract_tables(html) == [[["a", "b"]]]


def test_truncated_markup_flushed():
    html = "<table><tr><td>a</td><td>b"
    assert extract_tables(html) == [[["a", "b"]]]


def test_no_tables():
    assert extract_tables("<p>just text</p>") == []


def test_multiple_sibling_tables_in_order():
    html = (
        "<table><tr><td>t1</td></tr></table>"
        "<table><tr><td>t2</td></tr></table>"
    )
    assert extract_tables(html) == [[["t1"]], [["t2"]]]


def test_stray_close_tags_ignored():
    assert extract_tables("</td></tr></table><table><tr><td>a</td></tr></table>") == [
        [["a"]]
    ]


def test_script_and_style_inside_cells_dropped():
    html = (
        "<table><tr><td>a<script>var x = 1;</script></td>"
        "<td><style>.c{}</style>b</td></tr></table>"
    )
    assert extract_tables(html) == [[["a", "b"]]]


def test_table_inside_dropped_subtree_invisible():
    html = (
        "<form><table><tr><td>hidden</td></tr></table></form>"
        "<table><tr><td>visible</td></tr></table>"
    )
    assert extract_tables(html) == [[["visible"]]]


def test_empty_cells_kept():
    html = "<table><tr><td></td><td>x</td></tr></table>"
    assert extract_tables(html) == [[["", "x"]]]


def test_fast_sniff_matches_stdlib():
    """_fast_sniff must reproduce csv.Sniffer().sniff exactly — same
    dialect fields or the same csv.Error — over structured and random
    samples (the r6 delimiter-restricted frequency scan)."""
    import csv as _csv
    import random

    from hoover_snoop2_spark.operators.tables import (
        CSV_DELIMITER_LIST,
        _fast_sniff,
    )

    rng = random.Random(1234)
    samples = []
    # structured: every candidate delimiter, varying widths/rows, quoted
    # and unquoted, ragged, with prose mixed in
    for delim in CSV_DELIMITER_LIST:
        for rows in (1, 2, 9, 10, 11, 25):
            for cols in (1, 2, 5):
                body = "\n".join(
                    delim.join(f"v{r}x{c}" for c in range(cols))
                    for r in range(rows)
                )
                samples.append(body)
                samples.append(body + "\n")
                samples.append('h1%sh2\n"a%sb"%s"c"\n' % (delim, delim, delim))
        samples.append(f"name{delim} age\nann{delim} 3\nbob{delim} 4\n")
    samples += [
        "just prose with, commas and: colons | pipes; here and there",
        "a,b\nc;d\ne|f\ng:h\ni\tj",
        "x\ny\nz",
        ",,,\n,,,\n,,,",
        "a,b\n\n\nc,d\n",
        '"quoted,field",2\n"another,one",3\n',
    ]
    # random tag soup over a delimiter-heavy alphabet
    alphabet = "ab ,;|:\t\n'\"0123456789"
    for _ in range(400):
        samples.append("".join(rng.choice(alphabet)
                               for _ in range(rng.randrange(1, 400))))

    def outcome(fn, sample):
        try:
            d = fn(sample)
        except _csv.Error as e:
            return ("error", str(e))
        return (d.delimiter, d.quotechar, d.doublequote, d.skipinitialspace)

    for s in samples:
        ref = outcome(lambda x: _csv.Sniffer().sniff(x, CSV_DELIMITER_LIST), s)
        got = outcome(lambda x: _fast_sniff(x, CSV_DELIMITER_LIST), s)
        assert got == ref, (s[:80], got, ref)
