"""DOM-node main-content extraction (functions/html_extract): the
readability/trafilatura-style text-density + link-density scoring the
north star names, plus the HTML source wiring into the flagship core."""

from __future__ import annotations

import pytest

from agentic_document_extraction_pdf_ray.functions.html_extract import (
    html_main_text, looks_like_html, parse_dom_nodes,
)

ARTICLE = """
<!DOCTYPE html>
<html><head><title>t</title><style>p{color:red}</style>
<script>var tracking = 1;</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/more">More</a></nav>
<header><h1>Site Banner</h1></header>
<article>
<h2>The actual headline</h2>
<p>This is the first paragraph of real article content, long enough to
pass the minimum text threshold with room to spare.</p>
<p>The second paragraph continues the story with more substantive prose
about the subject at hand and keeps flowing.</p>
<div><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a>
<a href="/d">four link texts dominate this node</a></div>
<p>Subscribe to our newsletter — click here for updates!</p>
</article>
<aside>Related articles you may like, sponsored content here.</aside>
<footer>Copyright 2026. All rights reserved. Privacy policy.</footer>
</body></html>
"""


class TestDomScoring:
    def test_keeps_article_drops_boilerplate(self):
        text = html_main_text(ARTICLE)
        assert "first paragraph of real article" in text
        assert "second paragraph continues" in text
        assert "The actual headline" in text           # headings kept
        # dropped subtrees / nodes
        assert "Home" not in text                      # nav subtree
        assert "tracking" not in text                  # script
        assert "color:red" not in text                 # style
        assert "Related articles" not in text          # aside subtree
        assert "All rights reserved" not in text       # footer subtree
        assert "Subscribe to our newsletter" not in text  # marker node
        assert "four link texts" not in text           # link-dense node

    def test_reasons_and_order(self):
        nodes = parse_dom_nodes(ARTICLE)
        kept = [n for n in nodes if n.kept]
        assert [n.tag for n in kept][:3] == ["h2", "p", "p"]
        reasons = {n.reason for n in nodes}
        assert {"heading", "main", "link_density",
                "boilerplate_marker"} <= reasons

    def test_link_density_math(self):
        nodes = parse_dom_nodes(
            "<p>plain words here make up most of this sentence "
            "<a href='/x'>tiny link</a> and the prose keeps going on.</p>")
        assert len(nodes) >= 1 and nodes[0].kept
        assert 0.0 < nodes[0].link_density < 0.5

    def test_malformed_and_empty(self):
        assert html_main_text("") == ""
        assert html_main_text("<p>unclosed paragraph but long enough to "
                              "be kept as main content anyway") != ""

    def test_sniffer(self):
        assert looks_like_html("<!DOCTYPE html><html></html>")
        assert looks_like_html("<div>x</div>")
        assert not looks_like_html("just words < 5 and > 3")
        assert not looks_like_html(None)


@pytest.mark.usefixtures("ray_session")
class TestHtmlSource:
    def test_read_and_flagship_composition(self, tmp_path):
        from agentic_document_extraction_pdf_ray.pipelines.extract import (
            extract_pages_pipeline,
        )
        from agentic_document_extraction_pdf_ray.sources import read_pages_auto
        from agentic_document_extraction_pdf_ray.sources.htmlpages import (
            read_html_pages,
        )
        p = tmp_path / "article.html"
        p.write_text(ARTICLE)
        pages = read_html_pages(str(p)).take_all()
        assert len(pages) == 1
        assert pages[0]["n_kept"] < pages[0]["n_nodes"]
        assert "first paragraph" in pages[0]["text"]

        from agentic_document_extraction_pdf_ray.sources.fileid import file_id
        mixed = read_pages_auto([str(p)]).take_all()
        assert mixed[0]["file"] == file_id(str(p))

        rows = extract_pages_pipeline([str(p)]).take_all()
        assert len(rows) == 1
        assert "first paragraph of real article" in rows[0]["extracted_text"]
