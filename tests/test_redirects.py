"""Redirect-folding (D2) goldens: chase + levenshtein spelling guard,
and the alias-merge effect the reference applies before grouping."""

import pandas as pd
import pytest

from caligraph_ray.stages.redirects import levenshtein, resolve_name


def test_levenshtein_basics():
    assert levenshtein('kitten', 'sitting') == 3
    assert levenshtein('abc', 'abc') == 0
    assert levenshtein('abc', 'abd', 2) == 1
    assert levenshtein('abc', 'xyzabc', 2) == 3   # cap+1 on early exit
    assert levenshtein('', 'ab') == 2


def test_resolve_name_chain_and_guard():
    rmap = {'Colour': 'Color', 'Color': 'Color theory', 'NYC': 'New York City'}
    # 2-hop chase: Colour → Color → Color theory; guard on (orig, FINAL):
    # levenshtein('Colour', 'Color theory') > 2 → keep ORIGINAL
    assert resolve_name('Colour', rmap) == 'Colour'
    # 1-hop within guard
    assert resolve_name('Color', {'Color': 'Colour'}) == 'Colour'
    # redirect to completely different name → guard keeps original
    assert resolve_name('NYC', rmap) == 'NYC'
    # no redirect → unchanged
    assert resolve_name('Paris', rmap) == 'Paris'
    # self-redirect terminates
    assert resolve_name('X', {'X': 'X'}) == 'X'


def test_fold_redirects_merges_aliases(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.redirects import fold_redirects
    mentions = pd.DataFrame({
        'name': ['Colour', 'Color', 'Colour', None, 'NYC'],
        'norm_surface': ['colour', 'color', 'colour', 'nyc', 'nyc'],
    })
    redirects = pd.DataFrame({'src': ['Colour', 'NYC'],
                              'tgt': ['Color', 'New York City']})
    out = fold_redirects(rd.from_pandas(mentions), rd.from_pandas(redirects),
                         col='name').to_pandas()
    # 'Colour' folds into 'Color' (lev 1) → the two surfaces now share one
    # entity before any grouping; 'NYC' is guard-rejected; nulls pass through
    assert out['name'].tolist() == ['Color', 'Color', 'Color', None, 'NYC']


def test_fold_redirects_distinct_name_fast_path(ray_session):
    # the per-distinct-name fold must equal the per-row fold, including
    # guard rejections, non-redirecting names and nulls
    import ray.data as rdata
    from caligraph_ray.stages.redirects import fold_redirects
    redirects = pd.DataFrame({
        'src': ['Colour', 'Colouur', 'Jump'],
        'tgt': ['Color', 'Colour', 'CompletelyDifferentName']})
    ds = rdata.from_pandas(pd.DataFrame({
        'name': ['Colour', 'Colour', 'Colouur', 'Jump', 'Plain', None]}))
    out = fold_redirects(ds, rdata.from_pandas(redirects),
                         max_hops=2, guard=2).to_pandas()
    got = list(out['name'])
    assert got[:2] == ['Color', 'Color']       # spelling redirect folds
    assert got[2] == 'Color'                   # chain chased, guard ≤ 2 ok
    assert got[3] == 'Jump'                    # guard rejects a far target
    assert got[4] == 'Plain'                   # not a redirect source
    assert got[5] is None or pd.isna(got[5])   # null passes through
