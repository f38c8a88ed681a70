"""Web-corpus stage tests: the HTML render is pinned byte-for-byte against
a HAND-WRITTEN page (so the oracle's recover-the-original check cannot be
satisfied by compensating render+extract bugs), extraction is exercised on
hand-authored adversarial HTML (bare '<' inside scripts, entities, nested
inline tags), URL normalization collapses all three messy renderings to
one canonical form, and both plans are locked shuffle-free with no Python
evaluation nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_old_spark.queries.web_corpus import (
    corpus_url_normalize,
    extract_html_text,
    normalize_url,
    render_html_page,
    text_html_extract,
)

# What render_html_page must produce for doc_id=3, text='alpha beta',
# lang='ru' — written BY HAND from the documented page layout.
HAND_PAGE = (
    "<html><head><title>doc 3</title>"
    "<style>body { margin: 0; }</style>"
    "<script>var id=3; if (id < 99) { id = id + 1; }</script></head>"
    "<body><nav>"
    '<a href="/p/1">more</a><a href="/p/2">more</a>'
    '<a href="/p/3">more</a><a href="/p/4">more</a>'
    "</nav><p><b>alpha</b>&nbsp;beta</p>"
    '<script type="text/javascript">if (2 < 3) { track(); }</script>'
    "<footer>&copy; ru</footer></body></html>"
)


def test_render_matches_hand_written_page(spark):
    df = spark.createDataFrame([Row(doc_id=3, text="alpha beta", lang="ru")])
    page = df.select(
        render_html_page(F.col("doc_id"), F.col("text"), F.col("lang")).alias("h")
    )
    assert page.collect()[0].h == HAND_PAGE


def test_extract_recovers_text_from_hand_written_page(spark):
    df = spark.createDataFrame([Row(h=HAND_PAGE)])
    out = df.select(extract_html_text(F.col("h")).alias("t")).collect()[0].t
    assert out == "alpha beta"


@pytest.mark.parametrize(
    "html,expected",
    [
        # bare '<' inside a body script must not eat following content
        ("<p>keep</p><script>if (1 < 2) { x(); }</script><p>this</p>",
         "keep this"),
        # entity decoding, &amp; last so '&amp;nbsp;' stays literal text
        ("<p>a &amp; b &lt;tag&gt; &#39;q&#39; &quot;w&quot; &amp;nbsp;</p>",
         "a & b <tag> 'q' \"w\" &nbsp;"),
        # nav/footer boilerplate dropped wholesale, inline tags unwrapped
        ("<nav>menu menu</nav><p>real <i>content</i> here</p><footer>c</footer>",
         "real content here"),
        # head removal takes title/style with it
        ("<head><title>t</title><style>p{}</style></head><body><p>x</p></body>",
         "x"),
        # '>' inside a quoted attribute must not split the tag early
        ('<a title="a>b" href="/x">link</a> <img alt=\'5 > 4\'/> tail',
         "link tail"),
    ],
)
def test_extract_adversarial_fragments(spark, html, expected):
    df = spark.createDataFrame([Row(h=html)])
    assert df.select(extract_html_text(F.col("h")).alias("t")).collect()[0].t == expected


def test_html_extract_end_to_end(spark, sf_dir):
    rows = text_html_extract(spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert len(rows) == len(docs)
    for r in rows:
        # extraction recovered the original text through the HTML wrapping
        assert r.extracted == " ".join(docs[r.doc_id].split())
        assert r.title == f"doc {r.doc_id}"
        assert r.n_links == 1 + r.doc_id % 5


@pytest.mark.parametrize(
    "raw,want_url,want_domain",
    [
        # hand-written messy URL: case, default port, utm, fragment, slash
        ("HTTPS://WWW.News.Example.COM:443/A/1/?utm_source=x&b=2&a=1#f",
         "https://www.news.example.com/A/1?a=1&b=2", "news.example.com"),
        # no params survive -> no '?'; path-less -> '/'
        ("https://Example.com?utm_campaign=x#top", "https://example.com/",
         "example.com"),
        # http keeps an explicit :443 (not its default port)
        ("http://a.example.com:443/p?z=1&y=2", "http://a.example.com:443/p?y=2&z=1",
         "a.example.com"),
    ],
)
def test_normalize_url_hand_cases(spark, raw, want_url, want_domain):
    df = spark.createDataFrame([Row(raw=raw)])
    norm, domain = normalize_url(F.col("raw"))
    got = df.select(norm.alias("u"), domain.alias("d")).collect()[0]
    assert (got.u, got.d) == (want_url, want_domain)


def test_url_normalize_collapses_variants(spark, sf_dir):
    out = corpus_url_normalize(spark, sf_dir)
    # every doc_id%6 residue renders a distinct raw URL shape, but after
    # canonicalization the query string is always 'a=1&b=2' and no port,
    # fragment, uppercase, or trailing slash survives
    rows = out.collect()
    for r in rows:
        assert r.norm_url.startswith("https://www.src")
        assert r.norm_url.endswith(f"/Articles/{r.doc_id}?a=1&b=2")
        assert ":443" not in r.norm_url and "#" not in r.norm_url
        assert "utm" not in r.norm_url
        assert r.domain == r.norm_url.split("//www.")[1].split("/")[0]


def test_web_corpus_plans_are_map_only(spark, sf_dir):
    import io
    from contextlib import redirect_stdout

    for q in (text_html_extract, corpus_url_normalize):
        buf = io.StringIO()
        with redirect_stdout(buf):
            q(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, q.__name__
        assert "EvalPython" not in plan, q.__name__  # Batch- and Arrow-


def test_normalize_url_canonicalization_properties(spark):
    """Canonicalization laws, checked over a seeded batch in one job:
    (1) idempotence — normalizing a normalized URL is a no-op;
    (2) variant-invariance — scheme/host case, https default port,
        fragments, utm params, and query-param order never change the
        canonical form."""
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        host = f"Sub{i % 7}.Example.COM"
        params = [f"a={i}", "b=2", "c=xyz"]
        rng.shuffle(params)
        variants = []
        for perm in itertools.islice(itertools.permutations(params), 3):
            qs = "&".join(perm + ("utm_source=feed",) if i % 2 else perm)
            scheme = rng.choice(["https", "HTTPS", "HttpS"])
            port = ":443" if i % 3 == 0 else ""
            frag = f"#s{i}" if i % 4 == 0 else ""
            variants.append(f"{scheme}://{host}{port}/P/{i}?{qs}{frag}")
        rows.append((i, variants[0], variants[1], variants[2]))

    df = spark.createDataFrame(rows, "i long, u1 string, u2 string, u3 string")
    n1, _ = normalize_url(F.col("u1"))
    n2, _ = normalize_url(F.col("u2"))
    n3, _ = normalize_url(F.col("u3"))
    out = df.select(n1.alias("n1"), n2.alias("n2"), n3.alias("n3"))
    renorm, _ = normalize_url(F.col("n1"))
    out = out.withColumn("again", renorm)
    for r in out.collect():
        assert r.n1 == r.n2 == r.n3, r   # variant-invariance
        assert r.again == r.n1, r        # idempotence


def test_sft_chat_render_correct_under_planted_mega_user(spark):
    """Skew correctness: a user with 50k events still yields exactly the
    first _MAX_TURNS turns in (ts, event_id) order — the window cap runs
    before aggregation, so the mega-user neither breaks the render nor
    floods the aggregate."""
    import datetime

    from etl_pipeline_old_spark.queries import training_corpus as tc

    base = datetime.datetime(2026, 1, 1)
    mega = [(1, base + datetime.timedelta(seconds=i), i, f"t{i % 5}")
            for i in range(50_000)]
    small = [(2, base, 10_000_000, "solo")]
    df = spark.createDataFrame(
        mega + small, "user_id long, ts timestamp, event_id long, event_type string"
    )

    import unittest.mock as mock

    with mock.patch.object(tc, "load_table", lambda *_a, **_k: df):
        rows = {r.user_id: r for r in tc.sft_chat_render(spark, "ignored").collect()}
    assert rows[1].n_turns == tc._MAX_TURNS
    want = "".join(
        ("<|user|>" if i % 2 == 0 else "<|assistant|>") + f"t{i % 5}#{i}<|end|>"
        for i in range(tc._MAX_TURNS)
    )
    assert rows[1].rendered == want
    assert rows[2].rendered == "<|user|>solo#10000000<|end|>"
