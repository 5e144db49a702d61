"""Regression tests for the round-1 ADVICE findings."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import hooqu_ray as hq


def test_from_pandas_object_column_schema(ray_session):
    """ADVICE (medium): RayRunner.schema() over pandas blocks with an
    object-dtype (string) column must not blow up in pa.from_numpy_dtype —
    analyzers over such datasets must compute real metrics, not Failures."""
    import ray.data as rd
    from hooqu_ray.runner import do_analysis_run

    df = pd.DataFrame({"s": ["a", "b", None, "b"], "x": [1.0, 2.0, 3.0, 4.0]})
    ds = rd.from_pandas(df)
    comp = hq.Completeness("s")
    mean = hq.Mean("x")
    ctx = do_analysis_run(ds, [comp, mean])
    assert ctx.metric_map[comp].value.get() == 0.75
    assert ctx.metric_map[mean].value.get() == 2.5


def test_mutual_information_empty_dataset_consistency(ray_session):
    """ADVICE (low): a ZERO-BLOCK dataset and a zero-ROW dataset must yield
    the same MutualInformation result (NaN), not a Failure for one shape."""
    import ray.data as rd
    from hooqu_ray.runner import do_analysis_run

    mi = hq.MutualInformation(["a", "b"])

    zero_rows = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    ctx_rows = do_analysis_run(zero_rows, [mi])
    assert math.isnan(ctx_rows.metric_map[mi].value.get())

    zero_blocks = rd.from_items([]) if hasattr(rd, "from_items") else None
    ctx_blocks = do_analysis_run(zero_blocks, [mi]) if zero_blocks is not None else None
    if ctx_blocks is not None:
        assert math.isnan(ctx_blocks.metric_map[mi].value.get())


@pytest.mark.parametrize(
    "text",
    [
        "ok ſcuzzbucket here",        # U+017F long s folds to 's' under Python re.I
        "bad scuzzbucKet indeed",     # U+212A Kelvin sign folds to 'k'
        "FRAKKING loud",              # plain ASCII case
        "nothing toxic at all",
    ],
)
def test_scrub_prefilter_matches_unicode_folds(text):
    """ADVICE (low): the RE2 scrub prefilter must be a superset of the
    Python re.IGNORECASE TOXIC_RE matches, so the engine scrub output stays
    byte-equal to the oracle on Unicode-case-folded toxic words."""
    from hooqu_ray.stages.heuristics import compute_features
    from tests.reference_impl import oracle_scrub

    batch = pa.table({"text": pa.array([text], pa.string())})
    out = compute_features(batch)
    assert out.column("text_scrubbed").to_pylist()[0] == oracle_scrub(text)


def test_null_key_grouping_diverges_from_reference_fillna(ray_session):
    """VERDICT r1 "missing" item 2, pinned as an INTENTIONAL divergence.

    The reference fills null grouping keys with -1 before grouping
    (/root/reference/hooqu/analyzers/grouping_analyzers.py:66-75, a pandas
    <1.1 dropna-in-groupby workaround), so a null key COLLIDES with a
    literal -1 in the data: Uniqueness over keys (a,b) = [(-1,"x"),
    (None,"x")] is 0.0 there (one group of size 2).  This engine groups
    null as its own key value — the two rows are distinct groups and
    uniqueness is 1.0 — which matches SQL GROUP BY and pandas >= 1.1
    (dropna=False) semantics.  Both backends must agree on OUR semantics.
    """
    import ray.data as rd
    from hooqu_ray.runner import do_analysis_run

    tbl = pa.table(
        {
            "a": pa.array([-1, None], pa.int64()),
            "b": pa.array(["x", "x"], pa.string()),
        }
    )
    u = hq.Uniqueness(["a", "b"])
    local = do_analysis_run(tbl, [u], chunk_rows=1)
    assert local.metric_map[u].value.get() == 1.0  # reference would say 0.0
    dist = do_analysis_run(rd.from_arrow(tbl), [u])
    assert dist.metric_map[u].value.get() == 1.0

    # single-column shape: the all-null-key row is excluded from numerator
    # AND denominator on both sides (reference's WHERE ... IS NOT NULL rule)
    tbl2 = pa.table({"a": pa.array([-1.0, None, 5.0], pa.float64())})
    u2 = hq.Uniqueness(["a"])
    local2 = do_analysis_run(tbl2, [u2], chunk_rows=1)
    assert local2.metric_map[u2].value.get() == 1.0  # 2 unique / 2 counted


def test_clip_turn_texts_preserves_large_string_type(ray_session):
    """ADVICE r3 (low): clip_turn_texts rebuilt clipped batches as
    pa.string() while the under-budget fast path kept the input type — a
    large_string corpus produced mixed block schemas.  Both paths must now
    emit the INPUT text type."""
    import ray.data as rd
    from hooqu_ray.pipelines import transcripts as tp

    over = "tok " * 10
    t1 = pa.table({"conv_id": pa.array(["a", "a"]),
                   "turn_idx": pa.array([0, 1], pa.int64()),
                   "text": pa.array([over, "short"], pa.large_string())})
    t2 = pa.table({"conv_id": pa.array(["b"]),
                   "turn_idx": pa.array([0], pa.int64()),
                   "text": pa.array(["tiny"], pa.large_string())})
    ds = rd.from_arrow([t1, t2])  # one clipped block, one fast-path block
    out = tp.clip_turn_texts(ds, 3)
    schema = out.schema()
    assert schema.base_schema.field("text").type == pa.large_string()
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True)
    assert df.text.tolist() == ["tok tok tok", "short", "tiny"]
    assert df.clipped.tolist() == [True, False, False]


def test_fork_index_probe_int_keys_match_types(ray_session, tmp_path):
    """ADVICE r3 (low): matched_conv was hardcoded pa.string(); for an
    int-keyed corpus the (conv, matched_conv) pair must carry the probe
    input's and the persisted index's actual key types."""
    import ray.data as rd
    from hooqu_ray.pipelines import transcripts as tp

    def turns(conv_ids, salt=""):
        rows = {"conv_id": [], "turn_idx": [], "text": []}
        for c in conv_ids:
            for i in range(3):
                rows["conv_id"].append(c)
                rows["turn_idx"].append(i)
                rows["text"].append(f"shared-{i}" if i < 2 else f"t{c}{salt}")
        return pa.table({"conv_id": pa.array(rows["conv_id"], pa.int64()),
                         "turn_idx": pa.array(rows["turn_idx"], pa.int64()),
                         "text": pa.array(rows["text"], pa.string())})

    d = str(tmp_path / "fork_idx")
    tp.fork_index_write(rd.from_arrow(turns([101, 202])), 2, d)
    out = tp.fork_index_probe(rd.from_arrow(turns([303], salt="new")), d, 2)
    schema = out.schema()
    assert schema.base_schema.field("conv_id").type == pa.int64()
    assert schema.base_schema.field("matched_conv").type == pa.int64()
    df = out.to_pandas()
    assert df.conv_id.tolist() == [303]
    assert df.matched_conv.tolist() == [101]  # minimum indexed witness


def test_require_fresh_sink_uri_paths(tmp_path):
    """ADVICE r3 (low): the fresh-sink guard silently passed for URI sinks
    (os.path.isdir is False on 's3://...').  file:// URIs must now be
    checked through pyarrow.fs, and an unresolvable scheme must raise
    rather than skip the check."""
    from hooqu_ray.pipelines.transcripts import _require_fresh_sink

    stale = tmp_path / "idx" / "prefixes"
    stale.mkdir(parents=True)
    (stale / "part-0.parquet").write_bytes(b"x")
    with pytest.raises(ValueError, match="already contains"):
        _require_fresh_sink(f"file://{tmp_path}/idx", "prefixes")
    # fresh target under the same URI scheme passes
    _require_fresh_sink(f"file://{tmp_path}/fresh", "prefixes")
    # unresolvable scheme: refuse loudly, never silently skip
    with pytest.raises(ValueError, match="cannot verify"):
        _require_fresh_sink("noproto123://bucket/idx", "prefixes")


def test_empty_block_schema_warning_filter(ray_session):
    """VERDICT r3 (cosmetic): Ray 2.49 warns "RefBundle with a different
    schema ... new schema: ." whenever a map legitimately empties a block.
    The filter must drop exactly that variant and keep genuine
    schema-A-vs-schema-B warnings."""
    import logging

    import pyarrow as pa
    import ray.data as rd

    from hooqu_ray.util import (
        _EmptyBlockSchemaWarningFilter,
        install_empty_block_schema_warning_filter,
    )

    f = _EmptyBlockSchemaWarningFilter()

    class R:
        def __init__(self, m):
            self.m = m

        def getMessage(self):
            return self.m

    base = ("Operator produced a RefBundle with a different schema than "
            "the previous one. ")
    assert not f.filter(R(base + "Previous schema: conv_id: string, new "
                              "schema: . This may lead to unexpected behavior."))
    # the Previous-side-empty variant cannot occur (Ray 2.49 returns early
    # before warning when the previous schema is empty) — if a future Ray
    # ever emits it, it must PASS so we notice the behavior change
    assert f.filter(R(base + "Previous schema: , new schema: conv_id: "
                          "string. This may lead to unexpected behavior."))
    # a REAL conflict passes through
    assert f.filter(R(base + "Previous schema: a: int64, new schema: "
                          "a: string. This may lead to unexpected behavior."))
    assert f.filter(R("unrelated message"))

    # end-to-end: with the filter installed, the repro emits no warning
    install_empty_block_schema_warning_filter()
    install_empty_block_schema_warning_filter()  # idempotent
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    assert sum(isinstance(x, _EmptyBlockSchemaWarningFilter)
               for x in logger.filters) == 1
    seen = []

    class Probe(logging.Handler):
        def emit(self, record):
            seen.append(record.getMessage())

    probe = Probe()
    logger.addHandler(probe)
    try:
        t = pa.table({"conv_id": pa.array(["a", "b"], pa.string())})
        rd.from_arrow([t, t.slice(0, 0)]).map_batches(
            lambda x: x, batch_format="pyarrow").count()
    finally:
        logger.removeHandler(probe)
        logger.removeFilter(next(
            x for x in logger.filters
            if isinstance(x, _EmptyBlockSchemaWarningFilter)))
    assert not any("different schema" in m for m in seen), seen
