"""Structural gate #4: every driver-side ``.collect()`` in the engine
source is a BOUNDED pull, named in an explicit allowlist with its bound.

The other three gates (plan shapes, broadcast, cross-join) catch
executor-side scale killers; the classic driver-side one is a collect
whose size scales with the data. This gate turns the manual "all
collect sites are bounded" audit (PERF.md) into CI: it AST-walks the
package, resolves each ``.collect()`` call to its enclosing
``module::qualname``, and fails on any site not in the allowlist — so
a new unbounded collect cannot land silently. Line numbers are NOT
part of the key (they shift); function identity is.

A site belongs in the allowlist only when its result size is bounded
by a MODEL/PARAMETER quantity (k centroids, vocab seeds, merge table,
k-row response), never by the corpus.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "vector_database_app_spark"
)

#: (module path relative to the package, enclosing qualname) -> bound
ALLOWED: dict[tuple[str, str], str] = {
    ("api.py", "run_search"): "k result rows + k source rows (reference "
    "response envelope is a driver-side dict by definition)",
    ("streaming/windows.py", "run_stream_nsw_update._step"): "distinct "
    "batch buckets, bounded by 2^n_bits (index geometry, never corpus "
    "size)",
    ("functions/backends.py", "train_word2vec_vectors"): "|vocab| word "
    "vectors of the trained model (broadcast artifact)",
    ("operators/dedup.py", "connected_components_star._checksum"):
    "1-row convergence checksum per iteration",
    ("operators/dedup.py", "similarity_join"): "1-row drop-stats "
    "aggregate, only when the opt-in max_df_per_shingle cap is set "
    "(no-silent-cap logging; documented as not for zero-job registry "
    "constructors)",
    ("operators/pq.py", "pq_train"): "k init rows / m·k centroid means "
    "per iteration (k·d doubles total)",
    ("operators/pq.py", "_codebook_literal"): "m·k codebook rows "
    "(index metadata)",
    ("operators/search.py", "kmeans_train"): "k init vectors / k·dim "
    "centroid means per iteration",
    ("operators/textops.py", "train_quality_classifier"): "one weight "
    "vector (|features|+1 doubles) from the MLlib fit",
    ("operators/tokenize.py", "bpe_train"): "top-M pair counts per "
    "merge round (M <= vocab target)",
    ("operators/unigram.py", "seed_pieces"): "seed_size candidate "
    "pieces (vocabulary work, bounded by the parameter)",
    ("operators/unigram.py", "unigram_train"): "<= seed_size piece "
    "counts per EM round",
    ("plans/ann_planner.py", "choose_n_probe"): "|cells| recall rows "
    "on a query SAMPLE (cells ~ sqrt(N), sample fixed)",
    ("plans/artifacts.py", "load_or_train_rows"): "artifact rows "
    "(trainer outputs: centroids/codebooks/merge tables — bounded by "
    "model size, persisted once)",
}


def _collect_sites() -> set[tuple[str, str]]:
    sites: set[tuple[str, str]] = set()
    for p in sorted(PKG.rglob("*.py")):
        src = p.read_text()
        if ".collect()" not in src:
            continue
        tree = ast.parse(src)
        rel = str(p.relative_to(PKG))

        def walk(node, stack):
            for child in ast.iter_child_nodes(node):
                s = stack
                if isinstance(
                    child, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    s = stack + [child.name]
                if (
                    isinstance(child, ast.Call)
                    and isinstance(child.func, ast.Attribute)
                    and child.func.attr == "collect"
                ):
                    sites.add((rel, ".".join(stack) or "<module>"))
                walk(child, s)

        walk(tree, [])
    return sites


def test_every_collect_site_is_allowlisted_and_bounded():
    sites = _collect_sites()
    unlisted = sites - set(ALLOWED)
    assert not unlisted, (
        "new .collect() sites outside the bounded-pull allowlist "
        f"(document the bound or restructure): {sorted(unlisted)}"
    )


def test_allowlist_carries_no_dead_entries():
    """A removed collect must drop out of the allowlist too — stale
    entries would let an unbounded collect reuse a dead key's name."""
    sites = _collect_sites()
    dead = set(ALLOWED) - sites
    assert not dead, f"allowlist entries with no matching site: {sorted(dead)}"
