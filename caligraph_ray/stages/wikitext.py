"""Wikitext (wiki markup) front end for the page-structure parser.

The reference parses wiki markup with wikitextparser
(impl/wikipedia/page_parser.py:10-11, wikimarkup_parser.py:10-19); this
module is the engine's own markup parser covering the constructs those
call sites use — templates, comments, refs, bold/italic, wikilinks with
the reference's label quirks (wikimarkup_parser.py:34-47: <…> content
stripped, label falls back to target, ``rindex('|')`` on invalid nested
markup, File:/Image: links dropped), ``== heading ==`` sections,
``*``/``#`` enumerations with depth, ``{| … |}`` tables with ``!``
headers and ``||``/``!!`` inline cells, and ``[[Category:…]]`` links.

It emits the SAME ParsedPage/Listing/Item/Mention structures as the HTML
analogue (html_extract) under the same validity rules (≥3 enum entries,
tables with 2..100 cols and ≥3 data rows, meta top-sections dropped,
pages without valid listings filtered), so the XML-dump ingestion path
(sources/xml_dump.dump_to_pages) feeds the UNCHANGED downstream flagship:
read dump → parse_wikitext_pages → explode mentions → link → canonicalize
→ triples.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..config import (MAX_TABLE_COLS, MIN_ENUM_ENTRIES, MIN_TABLE_COLS,
                      MIN_TABLE_ROWS, META_SECTIONS)
from ..functions.strings import capitalize, remove_bracket_content, tokenize
from .html_extract import (Item, Listing, Mention, ParsedPage,
                           _build_label_index, _expand_mentions,
                           _locate_mentions)

_COMMENT_RE = re.compile(r'<!--.*?-->', re.S)
_REF_RE = re.compile(r'<ref\b[^>/]*/>|<ref\b[^>]*>.*?</ref>', re.S | re.I)
_NOWIKI_RE = re.compile(r'</?nowiki[^>]*>', re.I)
_TEMPLATE_RE = re.compile(r'\{\{[^{}]*\}\}', re.S)
_BOLD_ITALIC_RE = re.compile(r"'{2,}")
_WIKILINK_RE = re.compile(r'\[\[([^\[\]|]*)(?:\|([^\[\]]*))?\]\]')
_EXTLINK_RE = re.compile(r'\[(?:https?|ftp)://\S*(?: ([^\]]*))?\]')
_HEADING_RE = re.compile(r'^(={2,6})\s*(.*?)\s*\1\s*$')
_CATEGORY_RE = re.compile(r'\[\[Category:([^\[\]|]*)(?:\|[^\[\]]*)?\]\]',
                          re.I)
_SPACE_RE = re.compile(r' +')

_DROP_TARGET_PREFIXES = ('File:', 'Image:', 'Category:')


def _pre_clean(markup: str) -> str:
    """Comments/refs/nowiki/templates/bold-italic removed (the reference
    preprocesses bolds/italics before parsing, wikimarkup_parser.py:13)."""
    s = _COMMENT_RE.sub('', markup)
    s = _REF_RE.sub('', s)
    s = _NOWIKI_RE.sub('', s)
    for _ in range(10):   # nested templates resolve innermost-out
        s, n = _TEMPLATE_RE.subn('', s)
        if not n:
            break
    return _BOLD_ITALIC_RE.sub('', s)


def wikilink_label(target: str, text: Optional[str]) -> Optional[str]:
    """Reference get_label_for_wikilink (wikimarkup_parser.py:34-43):
    label = text or target; <…> content stripped; File:/Image: → None;
    invalid nested '|' keeps the part after the LAST pipe."""
    label = (text if text else target)
    if not label:
        return None
    label = remove_bracket_content(label.strip(), bracket_type='<')
    if target.startswith(('File:', 'Image:')):
        return None
    if '|' in label:
        label = label[label.rindex('|') + 1:].strip()
    return label


def wikilink_name(target: str) -> Optional[str]:
    """Reference get_resource_name_for_wikilink (wikimarkup_parser.py:46-47):
    capitalized, '_' → ' ', leading language/interwiki colon stripped."""
    t = target.strip().lstrip(':')
    if not t:
        return None
    return capitalize(t.replace('_', ' '))


def _anchors_wikitext(fragment: str) -> List[Tuple[str, str]]:
    """(entity_name, label) pairs of a markup fragment, html_extract
    ``_anchors`` contract (File:/Image:/Category: dropped)."""
    out = []
    for m in _WIKILINK_RE.finditer(fragment):
        target = (m.group(1) or '').strip()
        if not target or target.startswith(_DROP_TARGET_PREFIXES):
            continue
        label = wikilink_label(target, m.group(2))
        name = wikilink_name(target)
        if not label or not name:
            continue
        out.append((name, label))
    return out


def _inline_to_text(fragment: str) -> str:
    """Inline markup → plaintext: wikilinks → label (dropped targets →
    ''), external links → label, whitespace squeezed (the reference's
    wikitext_to_plaintext squeeze, wikimarkup_parser.py:14-17)."""
    def link_sub(m: re.Match) -> str:
        target = (m.group(1) or '').strip()
        if target.startswith(_DROP_TARGET_PREFIXES):
            return ''
        return wikilink_label(target, m.group(2)) or ''

    s = _WIKILINK_RE.sub(link_sub, fragment)
    s = _EXTLINK_RE.sub(lambda m: m.group(1) or '', s)
    return _SPACE_RE.sub(' ', s).strip(" '\t\n")


def wikitext_to_plaintext(markup: str) -> str:
    """Whole-page plaintext (reference wikitext_to_plaintext,
    wikimarkup_parser.py:10-19): markup constructs resolved, lines kept,
    ``\\n+`` → ``\\n``, `` +`` → `` ``, stripped of ``\" '\\t\\n\"``."""
    s = _pre_clean(markup)
    s = _CATEGORY_RE.sub('', s)
    out_lines = []
    in_table = False
    for line in s.split('\n'):
        st = line.strip()
        if st.startswith('{|'):
            in_table = True
            continue
        if in_table:
            if st.startswith('|}'):
                in_table = False
            continue
        hm = _HEADING_RE.match(st)
        if hm:
            out_lines.append(_inline_to_text(hm.group(2)))
            continue
        st = st.lstrip('*#:; ')
        out_lines.append(_inline_to_text(st))
    text = '\n'.join(out_lines)
    text = re.sub(r'\n+', '\n', text)
    text = _SPACE_RE.sub(' ', text)
    return text.strip(" '\t\n")


def _split_cells(line: str, sep: str) -> List[str]:
    """Table row line → cell fragments; an attribute prefix before a
    single '|' (e.g. style=\"…\"|content) is dropped."""
    cells = []
    for cell in line.split(sep):
        if '|' in cell and '[[' not in cell.split('|', 1)[0] \
                and '=' in cell.split('|', 1)[0]:
            cell = cell.split('|', 1)[1]
        cells.append(cell)
    return cells


def _parse_wikitable(lines: List[str], label_index
                     ) -> Optional[Tuple[List[str], List[Item]]]:
    """Reference table rules on wikitext rows (page_parser.py:382-413
    semantics, same as the HTML path): cols in [2,100] every row, header =
    first row or any ! row, ≥3 data rows."""
    rows_raw: List[List[Tuple[bool, str]]] = []
    current: List[Tuple[bool, str]] = []
    for line in lines:
        st = line.strip()
        if st.startswith('|-'):
            if current:
                rows_raw.append(current)
                current = []
        elif st.startswith('|+') or st.startswith('{|') or st.startswith('|}'):
            continue
        elif st.startswith('!'):
            current.extend((True, c) for c in _split_cells(st[1:], '!!'))
        elif st.startswith('|'):
            current.extend((False, c) for c in _split_cells(st[1:], '||'))
    if current:
        rows_raw.append(current)

    header_tokens: List[str] = []
    rows: List[Item] = []
    row_idx = 0
    for cells in rows_raw:
        if not cells:
            continue
        if len(cells) < MIN_TABLE_COLS or len(cells) > MAX_TABLE_COLS:
            return None
        is_header = row_idx == 0 or any(h for h, _ in cells)
        toks: List[str] = []
        mentions: List[Mention] = []
        texts: List[str] = []
        for _, cell_src in cells:
            cell_text = _inline_to_text(cell_src)
            cell_toks = tokenize(cell_text)
            cms = _locate_mentions(cell_toks, _anchors_wikitext(cell_src))
            off = len(toks)
            for m in cms:
                mentions.append(Mention(m.name, m.label,
                                        m.start + off, m.end + off))
            toks.extend(cell_toks)
            texts.append(cell_text)
        if is_header:
            header_tokens = toks
        else:
            mentions = _expand_mentions(toks, mentions, label_index)
            rows.append(Item(len(rows), 1, True, ' '.join(texts), toks,
                             mentions))
        row_idx += 1
    if len(rows) < MIN_TABLE_ROWS:
        return None
    return header_tokens, rows


def parse_wikitext_page(url: str, markup) -> Optional[ParsedPage]:
    """Wiki markup → ParsedPage under the HTML path's validity rules;
    None when the page has no valid listings (usefulness filter)."""
    if markup is None:
        raise ValueError(f'null markup for {url}')
    if isinstance(markup, bytes):
        markup = markup.decode('utf-8', errors='replace')
    s = _pre_clean(markup)
    title = url.rsplit('/', 1)[-1].replace('_', ' ')

    categories = [m.group(1).strip().replace('_', ' ')
                  for m in _CATEGORY_RE.finditer(s)]
    body = _CATEGORY_RE.sub('', s)
    label_index = _build_label_index(_anchors_wikitext(body), title)

    listings: List[Listing] = []
    listing_idx = 0
    topsection, section = 'Main', 'Main'
    enum_block: List[Tuple[int, str]] = []
    table_block: Optional[List[str]] = None

    def flush_enum():
        nonlocal listing_idx, enum_block
        raw_items, enum_block = enum_block, []
        if len(raw_items) < MIN_ENUM_ENTRIES \
                or topsection.lower() in META_SECTIONS:
            return
        items: List[Item] = []
        for i, (depth, inline) in enumerate(raw_items):
            text = _inline_to_text(inline)
            toks = tokenize(text)
            ms = _locate_mentions(toks, _anchors_wikitext(inline))
            ms = _expand_mentions(toks, ms, label_index)
            is_leaf = (i + 1 >= len(raw_items)) or (raw_items[i + 1][0] <= depth)
            items.append(Item(i, depth, is_leaf, text, toks, ms))
        listings.append(Listing(listing_idx, 'enum', topsection, section,
                                items))
        listing_idx += 1

    def flush_table(lines: List[str]):
        nonlocal listing_idx
        if topsection.lower() in META_SECTIONS:
            return
        tbl = _parse_wikitable(lines, label_index)
        if tbl is None:
            return
        header_tokens, rows = tbl
        listings.append(Listing(listing_idx, 'table', topsection, section,
                                rows, header_tokens))
        listing_idx += 1

    for line in body.split('\n'):
        st = line.strip()
        if table_block is not None:
            table_block.append(st)
            if st.startswith('|}'):
                flush_table(table_block)
                table_block = None
            continue
        hm = _HEADING_RE.match(st)
        if hm:
            flush_enum()
            htitle = _inline_to_text(hm.group(2))
            if len(hm.group(1)) <= 2:
                topsection = htitle
            section = htitle
            continue
        if st.startswith('{|'):
            flush_enum()
            table_block = [st]
            continue
        marker = re.match(r'^([*#]+)\s*(.*)$', st)
        if marker:
            enum_block.append((len(marker.group(1)), marker.group(2)))
            continue
        flush_enum()
    flush_enum()
    if table_block is not None:   # unterminated table at EOF
        flush_table(table_block)

    if not listings:
        return None
    return ParsedPage(url, title, listings, categories)


def parse_wikitext_pages(pages_ds, concurrency: Optional[int] = None):
    """F1 pages Dataset whose ``html`` column carries WIKI MARKUP (the
    dump_to_pages output) → PARSED_SCHEMA union rows, same drop/timeout
    semantics as the HTML path (one kind='drop' row per failed page)."""
    from .html_extract import PARSE_BATCH_SIZE, PageParser

    def parse_batch(batch):
        return PageParser(parse_fn=parse_wikitext_page)(batch)

    kw = {} if concurrency is None else {'concurrency': concurrency}
    return pages_ds.map_batches(parse_batch, batch_format='pyarrow',
                                batch_size=PARSE_BATCH_SIZE, **kw)
