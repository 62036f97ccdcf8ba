"""Query-biased snippet extraction (analysis/highlight.py — the Lucene
highlighter's role) + the serving integration."""

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.analysis.highlight import best_window, make_snippet


def test_best_window_coverage():
    """The window maximizing idf-weighted unique-term coverage wins; density
    breaks coverage ties."""
    doc = ["a", "x", "x", "q1", "x", "q2", "x", "x", "q1", "q1", "q2", "q2"]
    terms = {"q1": 1.0, "q2": 2.0}
    start, end, score = best_window(doc, terms, window=4)
    # the tail window [8, 12) covers both terms with 4 hits (2 extra)
    assert (start, end) == (8, 12)
    assert score == pytest.approx(1.0 + 2.0 + 0.1 * 2)
    # a window smaller than any co-occurrence picks the highest-idf term
    s2, e2, sc2 = best_window(doc, {"q1": 1.0, "q2": 5.0}, window=1)
    assert doc[s2:e2] == ["q2"]


def test_make_snippet_marks_and_ellipses():
    text = "alpha beta gamma delta epsilon zeta eta theta GAMMA iota"
    snip = make_snippet(text, {"gamma": 1.0}, window=3)
    assert "<em>" in snip and "</em>" in snip
    # analyzer defaults to lowercase: both surface forms would match; the best
    # window is chosen around a hit and truncation is marked
    assert "gamma" in snip.lower()
    assert snip.count("…") >= 1  # text extends beyond the window on some side

    # match preserves the ORIGINAL surface form inside the markers
    snip2 = make_snippet(text, {"gamma": 1.0}, window=30)
    assert "<em>gamma</em>" in snip2 and "<em>GAMMA</em>" in snip2
    assert "…" not in snip2  # full-text window: no truncation markers

    # no matches: returns a plain prefix-ish snippet without markers
    snip3 = make_snippet(text, {"zzz": 1.0}, window=3)
    assert "<em>" not in snip3


def test_make_snippet_boundaries_and_escaping():
    # a doc starting with punctuation is NOT truncated: no leading ellipsis,
    # and the leading characters survive
    text = '"alpha beta gamma" said someone'
    snip = make_snippet(text, {"alpha": 1.0}, window=50)
    assert snip.startswith('"alpha') or snip.startswith('"<em>alpha')
    assert "…" not in snip

    # document markup is escaped (SimpleHTMLEncoder role): corpus <em>/<script>
    # can neither inject nor masquerade as highlighter output
    import html

    evil = "gamma <script>alert(1)</script> and a literal <em>tag</em>"
    snip2 = make_snippet(evil, {"gamma": 1.0}, window=50, escape=html.escape)
    assert "<script>" not in snip2 and "&lt;script&gt;" in snip2
    assert snip2.count("<em>") == 1  # only the highlighter's own marker
    assert "&lt;em&gt;" in snip2


def test_snippets_for_hits_stemming_aware(tmpdir_as_cache):
    """Through the index analyzer, 'galaxies' in the query highlights the
    document's inflected surface forms (Porter: galaxies -> galaxi)."""
    from capreolus_tpu.analysis.highlight import snippets_for_hits
    from capreolus_tpu.index import Index

    index = Index.create("tpu", {"collection": {"name": "dummy"}})
    index.create_index()
    snips = snippets_for_hits(index, "distant galaxies", [("D003", 1.0), ("D001", 0.5)])
    assert len(snips) == 2
    assert "<em>" in snips[0] and "galaxi" in snips[0].lower()
    # D001 mentions galaxies too — marked through the shared analyzer
    assert "<em>" in snips[1]


def test_http_snippets_flag(tmpdir_as_cache):
    """POST /search with snippets=true returns one snippet list per query."""
    import json
    import threading
    import urllib.request

    from capreolus_tpu.serving import RetrievalService
    from capreolus_tpu.serving_http import make_server

    svc = RetrievalService.from_config(collection="dummy")
    server = make_server(svc, port=0, window_ms=0.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address
        body = json.dumps({"queries": ["orbit telescope launch"], "k": 2,
                           "snippets": True}).encode()
        req = urllib.request.Request(f"http://{host}:{port}/search", data=body,
                                     headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert len(resp["results"]) == 1 and resp["results"][0]
        assert len(resp["snippets"]) == 1
        assert len(resp["snippets"][0]) == len(resp["results"][0])
        assert any("<em>" in s for s in resp["snippets"][0])
    finally:
        server.shutdown()
        server.batcher.close()
