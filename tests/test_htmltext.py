"""HTML -> text extraction: unit vectors for the per-row contract, the
Spark expression twin, and the no-shuffle plan shape."""

from pyspark.sql import functions as F

from data_quality_spark.operators.htmltext import (
    extract_text_expr,
    extract_text_str,
    ws_normalize_str,
)


def test_basic_page():
    html = (
        "<html><head><title>T</title><script>var x=1;</script></head>"
        "<body><nav>Home | About</nav><h1>Title</h1>"
        "<p>Hello <b>world</b>.</p><p>Second para.</p>"
        "<footer>(c) site</footer></body></html>"
    )
    assert extract_text_str(html) == "Title\nHello world.\nSecond para."


def test_entities_decode_once():
    # literal "&lt;" in source text escapes to "&amp;lt;" and must decode
    # back to "&lt;", not "<" (amp is decoded LAST, single pass each)
    assert extract_text_str("<p>&amp;lt; &amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b</p>") == (
        "&lt; & <tag> \"q\" 's' a b"
    )


def test_head_boundary_does_not_eat_header():
    # \b after "head" keeps <header> out of the head-drop rule
    html = "<head><title>x</title></head><header>Site Header</header><p>body</p>"
    assert extract_text_str(html) == "Site Header\nbody"


def test_whitespace_normalization():
    assert extract_text_str("<p>  a\t\tb  </p>\r\n<p>c</p>") == "a b\nc"
    assert ws_normalize_str("  a  \n\n\n b \x0B c \n") == "a\nb c"


def test_vertical_tab_is_blank_not_newline():
    # regression: Java's \v is a vertical-whitespace CLASS (incl. \n);
    # the pattern must use \x0B so all three engines collapse VT to a
    # space while leaving real newlines alone
    assert extract_text_str("<p>a\x0Bb</p><p>c</p>") == "a b\nc"


def test_unclosed_and_empty():
    assert extract_text_str("<p>text <i>oops</p>") == "text oops"
    assert extract_text_str("") == ""
    assert extract_text_str(None) is None


def test_nested_same_tag_truncates_at_first_close():
    # documented regex-extractor trade-off: inner close ends the drop
    out = extract_text_str("<nav>a <nav>b</nav> tail</nav><p>x</p>")
    assert out == "tail\nx"


def test_expr_matches_str_twin(spark):
    cases = [
        "<html><body><p>plain</p></body></html>",
        "<head><style>a{}</style></head><p>&amp;lt; &nbsp; x</p>",
        "<nav>n</nav><h2>H</h2><div>d1</div><div>d2</div><!-- c -->",
        "no tags at all &amp; entities",
        "<p>a\x0Bb\tc\r</p>",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["html"])
    got = [r["t"] for r in df.select(extract_text_expr(F.col("html")).alias("t")).collect()]
    assert got == [extract_text_str(c) for c in cases]


def test_extraction_plan_has_no_exchange(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = df.select(extract_text_expr(F.col("text")).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pages_fixture_extraction_invariant(spark):
    """input_hint per-row invariant: extracted text byte-equals the text
    column for every url of the product pages fixture."""
    from data_quality_spark.schema import synthesize_pages

    pages = synthesize_pages(spark, 300)
    mism = (
        pages.select(
            "url",
            extract_text_expr(F.col("html").cast("string")).alias("ex"),
            "text",
        )
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_doctype_and_cdata_dropped():
    assert extract_text_str("<!DOCTYPE html><html><body><p>hi</p></body></html>") == "hi"
    assert extract_text_str("<?xml version=\"1.0\"?><p>x</p>") == "x"
    assert (
        extract_text_str("<p>a</p><![CDATA[ raw <junk> ]]><p>b</p>") == "a\nb"
    )


def test_numeric_entity_decode():
    # decimal + hex (either case marker, leading zeros) decode
    assert extract_text_str("<p>&#8216;q&#8217; &#x2014; &#X2019; &#039;</p>") == "‘q’ — ’ '"
    # invalid refs stay literal: NUL, surrogate, out-of-range, malformed
    assert extract_text_str("<p>&#0; &#xD800; &#1114112; &#x; &#xG1;</p>") == (
        "&#0; &#xD800; &#1114112; &#x; &#xG1;"
    )
    # double-escaped ref: &amp; decodes LAST, so the ref survives as text
    assert extract_text_str("<p>&amp;#8212;</p>") == "&#8212;"
    # documented single-pass divergence: a decode that CREATES another
    # listed ref decodes it too (engine-consistent sorted fold)
    assert extract_text_str("<p>&#38;#66; &#66;</p>") == "B B"
    # supplementary plane (4-byte UTF-8 path)
    assert extract_text_str("<p>&#128512;</p>") == "\U0001F600"


def test_numeric_entity_expr_twin(spark):
    cases = [
        "<p>&#8216;q&#8217; &#x2014; &#X2019; &#039;</p>",
        "<p>&#0; &#xD800; &#1114112; &#x; &#xG1;</p>",
        "<p>&amp;#8212;</p>",
        "<p>&#38;#66; &#66;</p>",
        "<p>&#128512; &#65;</p>",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["html"])
    got = [r["t"] for r in df.select(extract_text_expr(F.col("html")).alias("t")).collect()]
    assert got == [extract_text_str(c) for c in cases]


def test_numeric_entity_duckdb_twin():
    import duckdb

    from data_quality_spark.operators.htmltext import extract_text_sql

    cases = [
        "<p>&#8216;q&#8217; &#x2014; &#X2019; &#039;</p>",
        "<p>&#0; &#xD800; &#1114112; &#x; &#xG1;</p>",
        "<p>&amp;#8212;</p>",
        "<p>&#38;#66; &#66;</p>",
        "<p>&#128512; &#65;</p>",
    ]
    for c in cases:
        lit = "'" + c.replace("'", "''") + "'"
        got = duckdb.sql(f"SELECT {extract_text_sql(lit)} AS t").fetchone()[0]
        assert got == extract_text_str(c), c
