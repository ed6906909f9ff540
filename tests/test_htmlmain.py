"""HTML boilerplate strip: block classifier unit tests + the
byte-identical roundtrip through the actor-pool stage."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_block_classifier_features():
    from pd3f_ray.stages.htmlmain import html_blocks, main_text

    html = (
        "<html><body>"
        "<nav><a href='/'>Home</a> <a href='/x'>About us page</a></nav>"
        "<p>This paragraph is long enough to be kept as main content "
        "and has no links at all inside it.</p>"
        "<p>Short.</p>"
        "<p>This block is long enough but is essentially a list of "
        "<a href='/1'>link one text</a> <a href='/2'>link two text</a> "
        "<a href='/3'>link three text</a> <a href='/4'>link four</a> "
        "<a href='/5'>link five text here</a></p>"
        "<footer><p>A footer sentence that is definitely long enough "
        "to pass the length threshold.</p></footer>"
        "</body></html>"
    )
    blocks = html_blocks(html)
    mains = [b for b in blocks if b["is_main"]]
    assert len(mains) == 1
    assert mains[0]["text"].startswith("This paragraph is long enough")
    # the nav block is link-dense AND in a drop region
    nav = next(b for b in blocks if "Home" in b["text"])
    assert nav["in_drop_region"] and not nav["is_main"]
    # short block dropped by length, link farm by density, footer by region
    short = next(b for b in blocks if b["text"] == "Short.")
    assert not short["is_main"]
    farm = next(b for b in blocks if "link one text" in b["text"])
    assert farm["link_density"] > 0.33 and not farm["is_main"]
    foot = next(b for b in blocks if "footer sentence" in b["text"])
    assert foot["in_drop_region"] and not foot["is_main"]
    assert main_text(html).startswith("This paragraph")


def test_entity_unescape_roundtrip():
    from pd3f_ray.pipelines.webtext import wrap_in_boilerplate
    from pd3f_ray.stages.htmlmain import main_text

    text = ("tokens with specials like a<b and x&y plus \"quotes\" "
            "survive escaping and unescaping byte for byte exactly")
    assert main_text(wrap_in_boilerplate(text), joiner=" ") == text


def test_html_roundtrip_oracle(ray_session):
    from pd3f_ray.pipelines.webtext import HTML_ROUNDTRIP_SQL, html_roundtrip

    got = (html_roundtrip(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')")
    want = (con.execute(HTML_ROUNDTRIP_SQL).df()
            .sort_values("url").reset_index(drop=True))
    assert (got["text"] == want["text"]).all()
    assert len(got) == 500


def test_malformed_html_never_raises():
    """Garbage / truncated / misnested HTML must degrade, not raise —
    the stage's dead-letter-free contract (html.parser is tolerant and
    the block classifier only sees text runs)."""
    from pd3f_ray.stages.htmlmain import html_blocks, main_text

    cases = [
        "",
        "no tags at all just text that is comfortably long enough to keep",
        "<p>unclosed paragraph with enough characters to pass the filter",
        "<div><p>misnested </div> tails</p><footer>loose</p>",
        "<a href='x'>only a link</a>",
        "\x00binary\xff-ish<js>junk</p>",
        "<p>" + "x" * 100000 + "</p>",  # giant block
    ]
    for h in cases:
        blocks = html_blocks(h)
        assert isinstance(blocks, list)
        assert isinstance(main_text(h), str)
    # the unclosed-paragraph case still keeps its text
    assert "unclosed paragraph" in main_text(cases[2])


def test_extractor_stage_handles_bytes_and_garbage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pd3f_ray.stages.htmlmain import HtmlMainExtractor

    rows = pa.table({
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "html": pa.array(
            [b"<p>good long paragraph body text kept as main content</p>",
             b"\xff\xfe broken utf8 \x00<p>still fine and long enough to keep</p>",
             b""],
            pa.binary()),
    })
    out = (rd.from_arrow(rows)
           .map_batches(HtmlMainExtractor, batch_format="pyarrow",
                        concurrency=1, batch_size=8)
           .to_pandas().sort_values("url"))
    assert len(out) == 3
    assert "good long paragraph" in out.iloc[0]["text"]
    assert out.iloc[2]["text"] == ""


def test_extract_links_order_and_nesting():
    from pd3f_ray.stages.htmlmain import extract_links

    html = ('<body><a href="/a">first</a> text '
            '<div><a href="/b">sec<b>ond</b></a></div>'
            '<a href="/c"></a><a href="/d">tail')
    assert extract_links(html) == [
        ("/a", "first"), ("/b", "second"), ("/c", ""), ("/d", "tail")]


def test_html_links_oracle(ray_session):
    import duckdb
    import pandas as pd

    from pd3f_ray.pipelines.webtext import HTML_LINKS_SQL, html_links

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    got = canon(html_links(sf).to_pandas())
    want = canon(con.execute(HTML_LINKS_SQL).df())
    want = want.astype(got.dtypes.to_dict(), errors="ignore")
    pd.testing.assert_frame_equal(got, want)
