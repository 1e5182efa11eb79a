"""M8 goldens: template preparation, expansion (params, defaults, nesting,
cycles, redirects) and parent-category extraction with markers."""

import pandas as pd
import pytest

from caligraph_ray.stages.category_parser import (DISAMBIG_PARENT,
                                                  HIDDEN_PARENT,
                                                  SOFT_REDIRECT_PARENT,
                                                  expand_templates,
                                                  extract_parent_categories,
                                                  prepare_template_definitions)

DEFS = prepare_template_definitions({
    'Country cat': '[[Category:Categories by country]]'
                   '[[Category:{{{1|Unknown}}} categories]]',
    'Noinc': 'kept<noinclude>dropped[[Category:Never]]</noinclude>',
    'Only': 'before<onlyinclude>[[Category:Inner]]</onlyinclude>after',
    'Nested outer': '{{Nested inner}}',
    'Nested inner': '[[Category:Deep]]',
    'Loop a': '{{Loop b}}', 'Loop b': '{{Loop a}}[[Category:FromB]]',
    'Redir': '#REDIRECT [[Template:Nested inner]]',
    'Category redirect': 'redirects to [[:Category:{{{1}}}]]',
    'Maintenance category': '',
})


def test_prepare_definitions():
    assert DEFS['Noinc'] == 'kept'
    assert DEFS['Only'] == '[[Category:Inner]]'
    assert DEFS['Redir'] == '[[Category:Deep]]'   # redirect chased


def test_expand_with_parameters_and_defaults():
    out, visited = expand_templates('{{Country cat|French}}', DEFS)
    assert '[[Category:Categories by country]]' in out
    assert '[[Category:French categories]]' in out
    assert 'country cat' in visited
    out2, _ = expand_templates('{{Country cat}}', DEFS)
    assert '[[Category:Unknown categories]]' in out2


def test_nested_and_cycle_guard():
    out, visited = expand_templates('{{Nested outer}}', DEFS)
    assert '[[Category:Deep]]' in out
    assert {'nested outer', 'nested inner'} <= visited
    # cycle: expansion terminates; the cycle edge contributes nothing extra
    out3, _ = expand_templates('{{Loop a}}', DEFS)
    assert '[[Category:FromB]]' in out3


def test_extract_parents_with_markers():
    markup = ('Intro text {{Country cat|German}}\n'
              '[[Category:Explicit parent]]\n__HIDDENCAT__')
    parents = extract_parent_categories(markup, DEFS)
    assert 'Explicit parent' in parents
    assert 'Categories by country' in parents
    assert 'German categories' in parents
    assert HIDDEN_PARENT in parents

    redir = extract_parent_categories('{{Category redirect|Real target}}', DEFS)
    assert SOFT_REDIRECT_PARENT in redir
    maint = extract_parent_categories('{{Maintenance category}}', DEFS)
    assert HIDDEN_PARENT in maint


def test_parent_stage(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.category_parser import parent_categories_from_markup
    cats = pd.DataFrame({
        'cat_name': ['German cities', 'Weird cat'],
        'markup': ['{{Country cat|German}}[[Category:Cities]]', 'no templates'],
    })
    out = parent_categories_from_markup(rd.from_pandas(cats),
                                        {'Country cat': DEFS['Country cat']}).to_pandas()
    got = set(zip(out['cat_name'], out['parent_cat']))
    assert ('German cities', 'Cities') in got
    assert ('German cities', 'German categories') in got
    assert not any(c == 'Weird cat' for c, _ in got)


def test_redirect_chain_order_independent():
    # chains of length >= 2 resolve to the final target regardless of dict
    # iteration order; cycles resolve to empty
    from caligraph_ray.stages.category_parser import (
        extract_parent_categories, prepare_template_definitions)
    defs = prepare_template_definitions({
        'A': '#REDIRECT [[Template:B]]',
        'B': '#REDIRECT [[Template:C]]',
        'C': '[[Category:X]]',
        'Loop1': '#REDIRECT [[Template:Loop2]]',
        'Loop2': '#REDIRECT [[Template:Loop1]]',
        'LowerR': '#redirect [[template:C]]',
    })
    assert defs['A'] == '[[Category:X]]'
    assert defs['B'] == '[[Category:X]]'
    assert defs['Loop1'] == '' and defs['Loop2'] == ''
    assert defs['LowerR'] == '[[Category:X]]'     # case-insensitive keyword
    assert extract_parent_categories('{{A}}', defs) == {'X'}
    # MediaWiki matches the Category namespace case-insensitively too
    assert extract_parent_categories('[[category:Living people]]', defs) == \
        {'Living people'}
