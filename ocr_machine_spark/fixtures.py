"""Deterministic synthetic Common-Crawl-style page factory with goldens.

The analogue of the reference's training-set factory
(``training_strikethrough/processing_scripts/fake_scan.py``): generate inputs
whose ground truth is known **by construction** (its README lesson at
``training_strikethrough/README.md:4-11``), so the extractor can be verified
byte-identically against committed expectations — the role
``python_files/outputs/{full_response_output,bounding_boxes}.json`` play for
the reference.

Everything is keyed off ``random.Random(f"{seed}:{i}")`` (version-2 string
seeding, PYTHONHASHSEED-independent), so any row can be generated in isolation
on any executor — no sequential RNG state, which is what lets the same
generator scale out via ``spark.range(n).mapInPandas`` for the bench harness.

Golden computation never calls the extractor: the generator composes the page
from parts it already classified, and derives expected raw text / extracted
text / spans from its own layout arithmetic. Tests then assert the two
independent paths agree.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z — fixed, no wall clock

WORDS = (
    "municipal code section ordinance zoning council residential commercial "
    "district permit structure dwelling setback height boundary parcel lot "
    "easement variance hearing notice appeal schedule amendment adopted "
    "effective chapter article division standard requirement compliance "
    "inspection utility drainage frontage occupancy density buffer landscape"
).split()

NAV_WORDS = "home about news contact archive sitemap search login categories tags".split()

# a few mega-hosts own half the corpus → exercises salting (SURVEY.md §7 step 4)
MEGA_HOSTS = ["big0.example.com", "big1.example.com", "big2.example.com"]
N_SMALL_HOSTS = 1000

LANGS = ["en", "en", "en", "en", "en", "en", "en", "de", "fr", "es"]

# fixture case 10 (round 4): charset-variant pages. Words must round-trip the
# page's declared encoding; the goldens carry the UNICODE text, so a green
# gate proves the sniff-then-decode path recovered the exact non-ASCII
# content (a UTF-8-only decode mojibakes every one of these).
CS_WORDS = {
    "cp1252": ["café", "résumé", "naïve", "façade", "entrée", "décor", "cliché", "señor"],
    "shift_jis": ["東京", "条例", "市役所", "区域", "建築", "許可", "基準", "住宅"],
    "utf-8-sig": ["naïve", "café", "東京", "résumé", "condición", "münchen"],
}


def _sentence(rng: random.Random, lo: int = 8, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(WORDS) for _ in range(n)]
    return (" ".join(ws)).capitalize() + "."


def _nav_html(rng: random.Random) -> tuple[str, str]:
    """→ (html, visible_text). Link-heavy, short — lands on the boilerplate
    side of every gate."""
    items = rng.sample(NAV_WORDS, 5)
    lis = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in items)
    return f"<nav><ul>{lis}</ul></nav>", items


@dataclass
class GoldenPage:
    url: str
    warc_ts: int  # epoch seconds
    html: bytes
    text: str  # raw visible text (renderer policy)
    lang: str
    extracted_text: str
    spans: list[tuple[int, int, str]]
    removed_spans: list[tuple[int, int, str]]
    has_table: bool
    has_figure: bool
    # per-block golden rows, by construction (each visible line is exactly one
    # leaf block under the renderer policy): dicts with block_type, n_words,
    # is_content, start, end, row_idx, col_idx, header — the committed-oracle
    # role of the reference's full_response_output.json block list
    blocks: list[dict] = None
    # codec the html bytes are encoded with — the extractor must sniff and
    # report exactly this (codecs-normalized name)
    charset: str = "utf-8"
    # every <a href> in document order as (resolved_href, anchor_text), by
    # construction: nav links then link-farm links, root-relative hrefs
    # resolved against the page's scheme://host (core.extract.resolve_href
    # spec) — the link-graph golden
    outlinks: list[tuple[str, str]] = None


def make_page(i: int, seed: int = 42) -> GoldenPage:
    """Deterministically build page ``i`` plus its golden expectations."""
    rng = random.Random(f"{seed}:{i}")

    if rng.random() < 0.5:
        host = rng.choice(MEGA_HOSTS)
    else:
        host = f"site{rng.randrange(N_SMALL_HOSTS)}.example.org"
    url = f"https://{host}/page/{i}"
    warc_ts = EPOCH_2024 + (i % 31536000)
    lang = rng.choice(LANGS)

    boiler_only = rng.random() < 0.03  # fixture case 5
    with_table = (not boiler_only) and rng.random() < 0.10
    with_figure = (not boiler_only) and rng.random() < 0.05
    with_struck = (not boiler_only) and rng.random() < 0.15
    n_paras = 0 if boiler_only else rng.randint(2, 6)

    # fixture case 10: charset variants on ~24% of content pages (isolated
    # rng stream, so pages WITHOUT the case keep their fixture-v3 bytes). The
    # declared charset rides in the head (<meta charset> / http-equiv — both
    # forms exercised) or as a UTF-8 BOM; the page gains one non-ASCII
    # content paragraph that only survives a charset-correct decode.
    rng_cs = random.Random(f"{seed}:{i}:charset")
    r_cs = rng_cs.random()
    if boiler_only or r_cs >= 0.24:
        charset, meta_tag = "utf-8", ""
    elif r_cs < 0.10:
        charset, meta_tag = "cp1252", '<meta charset="windows-1252">'
    elif r_cs < 0.18:
        charset = "shift_jis"
        meta_tag = '<meta http-equiv="Content-Type" content="text/html; charset=shift_jis">'
    else:
        charset, meta_tag = "utf-8-sig", ""  # BOM, no declaration

    # ---- compose the page; track (visible_text_lines, kept_kind, reason) ----
    html_parts: list[str] = [f"<html><head>{meta_tag}<title>skip me</title>", "<body>"]
    # lines: (text, kind|None, reason|None, struck_rel) where struck_rel is a
    # list of (rel_start, rel_end) struck sub-spans within the line
    lines: list[tuple[str, str | None, str | None, list[tuple[int, int]]]] = []
    # parallel block metadata per line: (block_type, row_idx, col_idx, header)
    bmeta: list[tuple[str, int | None, int | None, bool]] = []

    nav_html, nav_items = _nav_html(rng)
    html_parts.append("<header><h1>Site Title Words</h1></header>")
    lines.append(("Site Title Words", None, "boilerplate", []))
    bmeta.append(("LAYOUT_HEADER", None, None, False))
    html_parts.append(nav_html)
    for w in nav_items:
        lines.append((w, None, "boilerplate", []))
        bmeta.append(("LAYOUT_HEADER", None, None, False))

    html_parts.append("<main>")
    heading = _sentence(rng, 3, 6).rstrip(".")
    html_parts.append(f"<h2>{heading}</h2>")
    if not boiler_only:
        lines.append((heading, "content", None, []))
        bmeta.append(("LAYOUT_SECTION_HEADER", None, None, False))
    else:
        # heading kept even on boiler-only pages (headings pass the gate) —
        # make boiler-only pages truly empty by skipping the heading
        html_parts.pop()

    struck_para = rng.randrange(n_paras) if (with_struck and n_paras) else -1
    for p in range(n_paras):
        sents = [_sentence(rng) for _ in range(rng.randint(2, 4))]
        if p == struck_para:
            # struck fragment mid-paragraph (strikethrough analogue)
            struck = _sentence(rng, 4, 8)
            pre = " ".join(sents[:1])
            post = " ".join(sents[1:]) or _sentence(rng)
            html_parts.append(f"<p>{pre} <del>{struck}</del> {post}</p>")
            full = f"{pre} {struck} {post}"
            s = len(pre) + 1
            e = s + len(struck)
            lines.append((full, "content", None, [(s, e)]))
            bmeta.append(("LAYOUT_TEXT", None, None, False))
        else:
            para = " ".join(sents)
            html_parts.append(f"<p>{para}</p>")
            lines.append((para, "content", None, []))
            bmeta.append(("LAYOUT_TEXT", None, None, False))

    if charset != "utf-8":
        n_cs = rng_cs.randint(5, 8)
        cs_para = (" ".join(rng_cs.choice(CS_WORDS[charset]) for _ in range(n_cs))).capitalize() + "."
        html_parts.append(f"<p>{cs_para}</p>")
        lines.append((cs_para, "content", None, []))
        bmeta.append(("LAYOUT_TEXT", None, None, False))

    if with_table:
        hdr = ["Zone", "Setback", "Height"]
        rows = [[f"R{rng.randint(1, 9)}", f"{rng.randint(5, 50)} ft", f"{rng.randint(20, 60)} ft"] for _ in range(2)]
        cells_html = "".join(f"<th>{h}</th>" for h in hdr)
        body_html = "".join("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows)
        html_parts.append(f"<table><tr>{cells_html}</tr>{body_html}</table>")
        for ci, h in enumerate(hdr):
            lines.append((h, "table", None, []))
            bmeta.append(("CELL", 1, ci + 1, True))
        for ri, r in enumerate(rows):
            for ci, c in enumerate(r):
                lines.append((c, "table", None, []))
                bmeta.append(("CELL", ri + 2, ci + 1, False))

    if with_figure:
        cap = _sentence(rng, 5, 9)
        html_parts.append(f'<figure><img src="/d.png"/><figcaption>{cap}</figcaption></figure>')
        lines.append((cap, "figure_caption", None, []))
        bmeta.append(("LAYOUT_FIGURE", None, None, False))

    # a short junk line (fails the word-count gate) on some pages
    if not boiler_only and rng.random() < 0.3:
        junk = " ".join(rng.choice(WORDS) for _ in range(3))
        html_parts.append(f"<div>{junk}</div>")
        lines.append((junk, None, "short", []))
        bmeta.append(("LAYOUT_TEXT", None, None, False))

    # mixed-content container (fixture case 9): direct text bracketing a
    # nested block — the shape whose hull-span handling silently duplicated
    # nested text pre-round-3. Isolated rng stream so pages WITHOUT this
    # section are byte-identical to earlier fixture versions.
    rng_mix = random.Random(f"{seed}:{i}:nested")
    mixed = (not boiler_only) and rng_mix.random() < 0.25
    if mixed:
        m_intro = _sentence(rng_mix, 6, 9)
        m_nested = _sentence(rng_mix, 6, 9)
        m_outro = _sentence(rng_mix, 6, 9)
        html_parts.append(f"<div>{m_intro} <p>{m_nested}</p> {m_outro}</div>")
        mixed_at = len(lines)  # segment indices: mixed_at, +1, +2
        lines.append((m_intro, "content", None, []))
        bmeta.append(("MIXED_PARENT", None, None, False))
        lines.append((m_nested, "content", None, []))
        bmeta.append(("LAYOUT_TEXT", None, None, False))
        lines.append((m_outro, "content", None, []))
        bmeta.append(("MIXED_OUTRO", None, None, False))  # folds into the parent row

    # link-farm sidebar (fails the link-density gate)
    farm_links = [rng.choice(WORDS) for _ in range(6)]
    farm_html = " ".join(f'<a href="/{w}">{w}</a>' for w in farm_links)
    html_parts.append(f"<div>related topics {farm_html}</div>")
    lines.append(("related topics " + " ".join(farm_links), None, "link_farm", []))
    bmeta.append(("LAYOUT_TEXT", None, None, False))

    # cross-host external links (fixture v5) — the webgraph feed: ~40% of
    # pages carry 2-4 absolute links to other fixture hosts (mega-hosts
    # become hubs), giving host_edges/host_pagerank a real skewed graph.
    # Isolated rng stream; the block is link-dense by construction (worst
    # case 6/17 = 0.353 > MAX_LINK_DENSITY) so its golden reason is
    # link_farm like the sidebar above.
    rng_ext = random.Random(f"{seed}:{i}:extlinks")
    ext_links: list[tuple[str, str]] = []
    if rng_ext.random() < 0.4:
        for _ in range(rng_ext.randint(2, 4)):
            if rng_ext.random() < 0.5:
                thost = rng_ext.choice(MEGA_HOSTS)
            else:
                thost = f"site{rng_ext.randrange(N_SMALL_HOSTS)}.example.org"
            w = rng_ext.choice(WORDS)
            ext_links.append((f"https://{thost}/page/{rng_ext.randrange(2000)}", w))
        ext_html = " ".join(f'<a href="{href}">{w}</a>' for href, w in ext_links)
        html_parts.append(f"<div>elsewhere {ext_html}</div>")
        lines.append(("elsewhere " + " ".join(w for _, w in ext_links), None, "link_farm", []))
        bmeta.append(("LAYOUT_TEXT", None, None, False))
    html_parts.append("</main>")

    html_parts.append("<footer><p>copyright example press all rights reserved</p></footer>")
    lines.append(("copyright example press all rights reserved", None, "boilerplate", []))
    bmeta.append(("LAYOUT_HEADER", None, None, False))  # boiler p (tag != footer)
    html_parts.append("</body></html>")

    # ---- derive goldens from the line layout (renderer policy: "\n" joins —
    # block enter AND leave both emit a newline separator, so a parent's
    # resumed text after a nested block is still its own line) --
    raw_lines = [ln[0] for ln in lines]
    raw_text = "\n".join(raw_lines)
    offsets: list[int] = []
    pos = 0
    for ln in raw_lines:
        offsets.append(pos)
        pos += len(ln) + 1

    kept_parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    removed: list[tuple[int, int, str]] = []
    blocks: list[dict] = []
    for idx, ((text_line, kind, reason, struck_rel), off, (btype, row_idx, col_idx, header)) in enumerate(
        zip(lines, offsets, bmeta)
    ):
        start, end = off, off + len(text_line)
        if btype == "MIXED_PARENT":
            # ONE block row for the container, spanning intro..outro (hull)
            # with n_words from its DIRECT runs only; each run is its own
            # kept span (the nested <p> between them is its own block/row)
            outro_text = lines[idx + 2][0]
            o_start = offsets[idx + 2]
            blocks.append(
                {
                    "block_type": "LAYOUT_TEXT",
                    "n_words": len(text_line.split()) + len(outro_text.split()),
                    "is_content": True,
                    "kind": kind,
                    "reason": None,
                    "start": start,
                    "end": o_start + len(outro_text),
                    "row_idx": None,
                    "col_idx": None,
                    "header": False,
                }
            )
            kept_parts.append(text_line)
            spans.append((start, end, kind))
            continue
        if btype == "MIXED_OUTRO":
            kept_parts.append(text_line)
            spans.append((start, end, kind))
            continue
        blocks.append(
            {
                "block_type": btype,
                "n_words": len(text_line.split()),
                "is_content": kind is not None,
                "kind": kind,
                "reason": reason,
                "start": start,
                "end": end,
                "row_idx": row_idx,
                "col_idx": col_idx,
                "header": header,
            }
        )
        if reason is not None:
            removed.append((start, end, reason))
            continue
        if struck_rel:
            cleaned = text_line
            for rs, re_ in sorted(struck_rel, reverse=True):
                # expansion rule: absorb the preceding space (always present
                # mid-paragraph in generated pages)
                removed.append((start + rs - 1, start + re_, "struck"))
                cleaned = cleaned[: rs - 1] + cleaned[re_:]
            kept_parts.append(cleaned)
        else:
            kept_parts.append(text_line)
        spans.append((start, end, kind))
    # removed spans are recorded in block order by the extractor: boilerplate
    # and struck interleave in document order already (lines are ordered)
    removed.sort(key=lambda t: t[0])

    base = f"https://{host}"
    outlinks = (
        [(f"{base}/{w}", w) for w in nav_items]
        + [(f"{base}/{w}", w) for w in farm_links]
        + ext_links
    )

    return GoldenPage(
        url=url,
        warc_ts=warc_ts,
        # "utf-8-sig" prepends the BOM on encode; the kanji/accents in the
        # charset paragraph are all representable in the page's own codec
        html="".join(html_parts).encode(charset),
        text=raw_text,
        lang=lang,
        extracted_text="\n".join(kept_parts),
        spans=spans,
        removed_spans=removed,
        has_table=with_table,
        has_figure=with_figure,
        blocks=blocks,
        charset=charset,
        outlinks=outlinks,
    )


def gen_pages(n: int, seed: int = 42, start: int = 0) -> list[GoldenPage]:
    return [make_page(i, seed) for i in range(start, start + n)]
