"""Category parent mining via template expansion (M8, reference
impl/wikipedia/category_parser.py:14-123): category markup is expanded
through the template-definition dim (includeonly/noinclude/onlyinclude
stripping, #REDIRECT chasing, parameter substitution with defaults,
recursive expansion with a cycle guard), then parent categories are the
``[[Category:X]]`` links of the expanded text plus marker-derived parents
(hidden / disambiguation / soft-redirect categories).

Ray shape: the template-definition dim is broadcast once (ray.put); the
category-markup table runs through a stateless ``map_batches``. The
expansion engine is a deterministic regex scanner (the reference uses
wikitextparser — same semantics for the constructs above).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Set, Tuple

import pandas as pd

from ..functions.strings import capitalize, regularize_spaces

_INCLUDEONLY_RE = re.compile(r'</?includeonly>')
_NOINCLUDE_RE = re.compile(r'<noinclude>(.|\n)*?</noinclude>')
_PARAM_RE = re.compile(r'\{\{\{([^{}]*?)\}\}\}')
_INNER_TEMPLATE_RE = re.compile(r'\{\{([^{}]*?)\}\}')
_CATEGORY_LINK_RE = re.compile(
    r'\[\[\s*Category:([^\[\]|]+)(?:\|[^\[\]]*)?\]\]', re.IGNORECASE)

MAX_EXPANSION_ROUNDS = 50

HIDDEN_PARENT = 'Hidden categories'
DISAMBIG_PARENT = 'Disambiguation categories'
SOFT_REDIRECT_PARENT = 'Wikipedia soft redirected categories'


def prepare_template_definitions(templates: Dict[str, str]) -> Dict[str, str]:
    """Template name → effective inclusion content (category_parser.py:45-65):
    strip includeonly tags, drop noinclude blocks, keep only the
    onlyinclude section when present, then chase #REDIRECT chains."""
    defs: Dict[str, str] = {}
    for name, content in templates.items():
        name = capitalize(name.replace('_', ' '))
        content = _INCLUDEONLY_RE.sub('', content)
        content = _NOINCLUDE_RE.sub('', content)
        content = _filter_for_onlyinclude(content)
        defs[name] = content
    def redirect_target(content: str):
        # MediaWiki matches the redirect keyword case-insensitively
        if not content[:9].upper().startswith('#REDIRECT'):
            return None
        m = re.search(r'\[\[\s*Template:([^\[\]|]+)\s*\]\]', content[9:],
                      re.IGNORECASE)
        return capitalize(m.group(1).strip().replace('_', ' ')) if m else ''

    for name in list(defs):
        # chase chains to a fixpoint, order-independently (a single pass
        # left earlier-iterated names pointing at raw '#REDIRECT' text when
        # the chain had length >= 2); the seen-set guards redirect cycles
        seen = {name}
        content = defs[name]
        while True:
            target = redirect_target(content)
            if target is None:
                break
            if not target or target in seen:
                content = ''
                break
            seen.add(target)
            content = defs.get(target, '')
        defs[name] = content
    return defs


def _filter_for_onlyinclude(text: str) -> str:
    """Keep only the <onlyinclude> section when the tag pair is present;
    an unterminated start tag yields nothing (MediaWiki inclusion rule)."""
    if '<onlyinclude>' not in text:
        return text
    _, _, tail = text.partition('<onlyinclude>')
    inner, sep, _ = tail.partition('</onlyinclude>')
    return inner if sep else ''


def _split_args(body: str) -> List[str]:
    """Split a template body on top-level '|' (link-internal pipes kept)."""
    parts, depth, cur = [], 0, []
    i = 0
    while i < len(body):
        two = body[i:i + 2]
        if two == '[[':
            depth += 1
            cur.append(two)
            i += 2
            continue
        if two == ']]':
            depth = max(0, depth - 1)
            cur.append(two)
            i += 2
            continue
        c = body[i]
        if c == '|' and depth == 0:
            parts.append(''.join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append(''.join(cur))
    return parts


def _substitute_params(content: str, args: Dict[str, str]) -> str:
    """Replace {{{name|default}}} parameters (category_parser.py:117-123);
    missing parameters fall back to their (recursively substituted) default
    or empty."""
    def repl(m):
        inner = m.group(1)
        if '|' in inner:
            name, default = inner.split('|', 1)
        else:
            name, default = inner, ''
        name = name.strip()
        if name in args:
            return args[name]
        return _substitute_params(default, args) if default else ''
    prev = None
    while prev != content:
        prev = content
        content = _PARAM_RE.sub(repl, content)
    return content


def _expand_call(body: str, defs: Dict[str, str], visited: Set[str]) -> str:
    parts = _split_args(body)
    name = capitalize(parts[0].strip(' \r\n\t').replace('_', ' '))
    if not name or name.lower() in visited:
        return ''
    visited.add(name.lower())
    args: Dict[str, str] = {}
    pos = 0
    for p in parts[1:]:
        if '=' in p:
            k, v = p.split('=', 1)
            args[k.strip(' \r\n\t')] = v
        else:
            pos += 1
            args[str(pos)] = p
    content = defs.get(name, '')
    content = _substitute_params(content, args)
    return _expand_text(content, defs, visited)


def _expand_text(text: str, defs: Dict[str, str], visited: Set[str]) -> str:
    for _ in range(MAX_EXPANSION_ROUNDS):
        m = _INNER_TEMPLATE_RE.search(text)
        if not m:
            break
        text = text[:m.start()] + _expand_call(m.group(1), defs, visited) + text[m.end():]
    return text


def expand_templates(markup: str, defs: Dict[str, str]) -> Tuple[str, Set[str]]:
    """Expand every top-level template of a markup string. Each top-level
    call gets a FRESH cycle-guard set (the reference does the same:
    _replace_templates_in_category passes set() per template); nested calls
    share their ancestor's set. Returns (expanded text, visited names)."""
    all_visited: Set[str] = set()
    for _ in range(MAX_EXPANSION_ROUNDS):
        m = _INNER_TEMPLATE_RE.search(markup)
        if not m:
            break
        visited: Set[str] = set()
        markup = markup[:m.start()] + _expand_call(m.group(1), defs, visited) + markup[m.end():]
        all_visited |= visited
    return markup, all_visited


def extract_parent_categories(markup: str, defs: Dict[str, str]) -> Set[str]:
    """One category's markup → its parent-category names
    (category_parser.py:26-39 incl. marker heuristics)."""
    content, visited = expand_templates(markup, defs)
    parents = {capitalize(regularize_spaces(m.group(1).strip()))
               for m in _CATEGORY_LINK_RE.finditer(content)}
    parents.discard('')
    if '__HIDDENCAT__' in content or 'maintenance category' in visited:
        parents.add(HIDDEN_PARENT)
    if 'category disambiguation' in visited or 'category ambiguous' in visited:
        parents.add(DISAMBIG_PARENT)
    if 'category redirect' in visited or 'cat redirect' in visited:
        parents.add(SOFT_REDIRECT_PARENT)
    return parents


def parent_categories_from_markup(cats_ds, templates: Dict[str, str],
                                  name_col: str = 'cat_name',
                                  markup_col: str = 'markup'):
    """(cat_name, markup) Dataset → (cat_name, parent_cat) edge rows via
    broadcast template definitions + stateless map_batches."""
    import ray
    defs = prepare_template_definitions(templates)
    ref = ray.put(defs)

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import get_broadcast
        d = get_broadcast(ref)
        names, parents = [], []
        for cat, markup in zip(batch[name_col], batch[markup_col]):
            for p in sorted(extract_parent_categories(markup or '', d)):
                names.append(cat)
                parents.append(p)
        return pd.DataFrame({name_col: names, 'parent_cat': parents})

    return cats_ds.map_batches(extract, batch_format='pandas')
