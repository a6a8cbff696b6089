"""Deterministic synthetic ``repo_files`` generator — the north-rule input.

Shape (BASELINE.json input_hint): ``repo string, path string, commit string,
lang string, content string``.  Generation is pure Spark column expressions
over ``spark.range`` — no driver-side loops, no Python UDFs — so the same
generator scales from 1k files (tests) to billions (bench on a cluster): the
rows are produced partition-parallel and never touch the driver.

The import structure is a closed-form function of the file index so tests
know the exact induced edge set (``expected_import_edges``): file ``i``
imports ``imports_per_file`` target modules ``(i * A + (j+1) * B) % n``
(self-targets bumped by 1 mod n), written as ``import org{r}.proj{r}.mod_{f}``
lines that the edge-derivation regexp must find and resolve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Knuth multiplicative-hash constants: deterministic, well-mixed targets.
_A = 2654435761
_B = 40503


def _module_name(r: "F.Column", f: "F.Column") -> "F.Column":
    return F.concat(
        F.lit("org"), r, F.lit(".proj"), r, F.lit(".mod_"), f
    )


def generate_repo_files(
    spark: SparkSession,
    n_repos: int = 50,
    files_per_repo: int = 20,
    imports_per_file: int = 3,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize a repo_files table with a known import graph.

    File index ``i`` in 0..n-1 maps to repo ``i // files_per_repo`` and
    in-repo file ``i % files_per_repo``.  Content carries a module docstring,
    ``imports_per_file`` import lines, and filler body text, all derived
    from ``i`` and ``seed`` only.
    """
    n = n_repos * files_per_repo
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    r = (i / files_per_repo).cast("long")
    f = i % files_per_repo

    # Deterministic import targets; bump self-imports to the next file.
    targets = F.transform(
        F.sequence(F.lit(1), F.lit(imports_per_file)),
        lambda j: (i * _A + j * _B + F.lit(seed)) % n,
    )
    targets = F.transform(
        targets, lambda t: F.when(t == i, (t + 1) % n).otherwise(t)
    )
    import_lines = F.transform(
        targets,
        lambda t: F.concat(
            F.lit("import "),
            _module_name((t / files_per_repo).cast("long"), t % files_per_repo),
        ),
    )

    content = F.concat(
        F.lit('"""module '),
        _module_name(r, f),
        F.lit(' (seed '),
        F.lit(str(seed)),
        F.lit(')"""\n'),
        F.concat_ws("\n", import_lines),
        F.lit("\n\ndef fn_"),
        f,
        F.lit("(x):\n    return x * "),
        (i * 31 + 7) % 1000,
        F.lit("\n"),
    )

    return df.select(
        F.concat(F.lit("org"), r, F.lit("/proj"), r).alias("repo"),
        F.concat(F.lit("src/mod_"), f, F.lit(".py")).alias("path"),
        F.substring(F.sha2(F.concat(F.lit("commit:"), i, F.lit(f":{seed}")), 256), 1, 12).alias(
            "commit"
        ),
        F.lit("py").alias("lang"),
        content.alias("content"),
    )


def expected_import_edges(
    n_repos: int, files_per_repo: int, imports_per_file: int = 3, seed: int = 42
) -> set[tuple[int, int]]:
    """Closed-form (src, dst) file-index edge set the generator induces.

    Vertex id == file index ``i`` (equals the dense id produced by
    ``densify_vertices`` because (repo, path) sort order matches index order
    only when repo/file counts have equal digit widths — tests use the
    key-based join on (repo, path) instead of relying on that).
    """
    n = n_repos * files_per_repo
    edges = set()
    for i in range(n):
        for j in range(1, imports_per_file + 1):
            t = (i * _A + j * _B + seed) % n
            if t == i:
                t = (t + 1) % n
            edges.add((i, t))
    return edges
