"""Licensed-collection format fidelity (VERDICT r4 next-step #4).

The reference types gov2 as TrecwebCollection (collection/gov2.py:15 — DOCHDR
blocks + raw HTML parsed to text by Jsoup) and cds/nyt/highwire as
JsonCollection (collection/{cds.py:18,nyt.py:18,highwire.py:17} — jsonl of
{"id", "contents"}). These tests pin the from-scratch equivalents on synthetic
fixture files with exact expected clean text: pointing a real GOV2 directory at
TpuIndex must index visible page text, never HTTP headers or markup.
"""

import textwrap

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.collection import Collection
from capreolus_tpu.utils.trec import html_to_text, iterate_trecweb_docs

TRECWEB_FIXTURE = textwrap.dedent("""\
    <DOC>
    <DOCNO>GX000-00-0000000</DOCNO>
    <DOCHDR>
    http://www.example.gov/energy HTTP/1.1
    HTTP/1.1 200 OK
    Content-Type: text/html; charset=iso-8859-1
    Content-Length: 512
    </DOCHDR>
    <!DOCTYPE html>
    <html>
    <head>
    <title>Energy Policy</title>
    <style>body { color: red; }</style>
    <script type="text/javascript">var tracked = "do not index";</script>
    </head>
    <body>
    <h1>Renewable &amp; Solar</h1>
    <p>Wind turbines generate
    clean power.</p>
    <noscript>enable javascript</noscript>
    </body>
    </html>
    </DOC>
    <DOC>
    <DOCNO> GX000-00-0000001 </DOCNO>
    <DOCHDR>
    http://www.example.gov/plain HTTP/1.0
    Content-Type: text/plain
    </DOCHDR>
    Just a plain text page with no markup at all.
    </DOC>
""")

# exact visible text: DOCHDR/HTTP headers gone, script/style/noscript gone,
# entity decoded, tags collapsed to word boundaries
TRECWEB_EXPECTED = [
    ("GX000-00-0000000", "Energy Policy Renewable & Solar Wind turbines generate clean power."),
    ("GX000-00-0000001", "Just a plain text page with no markup at all."),
]


def test_iterate_trecweb_docs(tmp_path):
    fn = tmp_path / "gx000.txt"
    fn.write_text(TRECWEB_FIXTURE, encoding="utf-8")
    assert list(iterate_trecweb_docs(fn)) == TRECWEB_EXPECTED


def test_trecweb_never_indexes_http_headers(tmp_path):
    fn = tmp_path / "gx.txt"
    fn.write_text(TRECWEB_FIXTURE, encoding="utf-8")
    for _, text in iterate_trecweb_docs(fn):
        low = text.lower()
        assert "http/1.1" not in low and "content-type" not in low
        assert "do not index" not in low and "color: red" not in low
        assert "enable javascript" not in low


def test_gov2_collection_is_trecweb(tmp_path):
    corpus = tmp_path / "gov2"
    corpus.mkdir()
    (corpus / "00.txt").write_text(TRECWEB_FIXTURE, encoding="utf-8")
    coll = Collection.create("gov2", {"path": str(corpus)})
    assert coll.collection_type == "trecweb"
    assert list(coll.get_doc_iterator()) == TRECWEB_EXPECTED


def test_json_collections_iterate_jsonl(tmp_path):
    lines = [
        '{"id": "NCT001", "contents": "title text abstract text body text"}',
        '{"id": "NCT002", "contents": "second document contents"}',
    ]
    corpus = tmp_path / "json"
    corpus.mkdir()
    (corpus / "docs.jsonl").write_text("\n".join(lines) + "\n", encoding="utf-8")
    expected = [("NCT001", "title text abstract text body text"),
                ("NCT002", "second document contents")]
    for name in ("cds", "nyt", "highwire", "wapo"):
        coll = Collection.create(name, {"path": str(corpus)})
        assert coll.collection_type == "jsonl", name
        assert list(coll.get_doc_iterator()) == expected, name


def test_html_to_text_edge_cases():
    assert html_to_text("<p>a&lt;b</p>") == "a<b"
    assert html_to_text("no markup") == "no markup"
    assert html_to_text("<script>x()</script><b>kept</b>") == "kept"
    # unclosed script: tolerant parser drops the dangling subtree, never raises
    assert "leak" not in html_to_text("<script>var leak = 1;")
    assert html_to_text("<br/>line one<br/>line two") == "line one line two"
    # style is raw text per HTML5: the first </style> closes it ("a<style>b"
    # is dropped as CSS), trailing text is kept — Jsoup agrees
    assert html_to_text("<style>a<style>b</style>c</style>ok") == "c ok"


def test_trecweb_doc_without_dochdr(tmp_path):
    """A DOC with no DOCHDR block is legal in the wild and Anserini indexes
    its content; only DOCHDR lines (URL + HTTP headers) are ever dropped."""
    fn = tmp_path / "nohdr.txt"
    fn.write_text("<DOC>\n<DOCNO>WX-1</DOCNO>\n<DOCOLDNO>OLD-9</DOCOLDNO>\n"
                  "hello <b>web</b> world\n</DOC>\n", encoding="utf-8")
    assert list(iterate_trecweb_docs(fn)) == [("WX-1", "hello web world")]
