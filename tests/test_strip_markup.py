"""HTML/markup stripping (`operators.text.strip_markup_expr`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.text import strip_markup_expr


def _strip(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "text string")
    return df.select(strip_markup_expr("text").alias("t")).first()["t"]


def test_scripts_styles_comments_drop_with_content(spark):
    html = (
        "<head><style>body { color: red }</style>"
        '<script type="text/js">if (1<2) { alert("x"); }</script></head>'
        "<p>keep me</p><!-- secret note -->"
    )
    assert _strip(spark, html) == "keep me"


def test_block_tags_become_newlines(spark):
    html = "<h1>Title</h1><p>one</p><p>two</p><div>three</div>line<br>four"
    assert _strip(spark, html) == "Title\none\ntwo\nthree\nline\nfour"


def test_entities_decode(spark):
    assert (
        _strip(spark, "a &amp; b &lt;c&gt; &quot;d&quot; e&nbsp;f &#39;g&#39;")
        == 'a & b <c> "d" e f \'g\''
    )


def test_whitespace_collapses(spark):
    html = "<p>a   b</p>\n\n\n<p>   c\t\td   </p><span>e</span>   <b>f</b>"
    # the blank line is the preserved paragraph break (runs of 3+
    # newlines collapse to exactly one blank line)
    assert _strip(spark, html) == "a b\n\nc d\ne f"


def test_case_insensitive_and_multiline(spark):
    html = "<SCRIPT>\nvar a = 1;\n</SCRIPT><P>ok</P>"
    assert _strip(spark, html) == "ok"


def test_double_escaped_entities_decode_once(spark):
    """&amp; decodes LAST (standard entity-decoding order): a
    double-escaped '&amp;lt;' is the literal text '&lt;', not '<' —
    and since tag-stripping already ran, it can never resurrect a tag
    (r7 advisor finding)."""
    assert _strip(spark, "x &amp;lt;b&amp;gt; y") == "x &lt;b&gt; y"
    assert _strip(spark, "&amp;amp;") == "&amp;"
    assert _strip(spark, "&amp;nbsp;") == "&nbsp;"
