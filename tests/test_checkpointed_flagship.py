"""End-to-end resumable flagship: fragments → committed partitions with
per-partition quality metrics → resume → merged corpus metrics."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from hooqu_ray.pipelines import transcripts as tp
from hooqu_ray.pipelines.synth import generate_transcripts


@pytest.fixture()
def fragment_files(tmp_path):
    paths = []
    for i in range(3):
        table = generate_transcripts(n_convs=25, seed=100 + i)
        p = tmp_path / f"transcripts_{i}.parquet"
        pq.write_table(table, str(p))
        paths.append(str(p))
    return paths


def test_checkpointed_flagship_run_and_resume(ray_session, fragment_files, tmp_path):
    out = str(tmp_path / "out")
    run, counters = tp.checkpointed_filter_scrub(fragment_files[:2], out)
    assert counters == {"processed": 2, "skipped": 0, "total": 2}

    # resume with the third fragment added: first two skipped
    run2, counters2 = tp.checkpointed_filter_scrub(fragment_files, out)
    assert counters2 == {"processed": 1, "skipped": 2, "total": 3}

    # corpus metrics merged from saved per-partition states (no re-scan)
    ctx = run2.merged_metrics()
    by_instance = {m.instance: m.value.get() for m in ctx.all_metrics()}
    assert by_instance["*"] == sum(
        pq.read_metadata(f).num_rows for f in fragment_files
    )
    assert 0.3 < by_instance["keep_rate"] < 0.95
    assert by_instance["pass_language"] > 0.7

    # each partition's parquet carries the scored, scrubbed rows
    files = glob.glob(os.path.join(out, "part=*", "data", "*.parquet"))
    df = pd.concat(pd.read_parquet(f) for f in files)
    assert {"keep", "text_scrubbed", "lang", "ppl"} <= set(df.columns)
    assert len(df) == by_instance["*"]

    # keep_rate metric agrees with the written data
    assert abs(df["keep"].mean() - by_instance["keep_rate"]) < 1e-12


def test_spec_change_invalidates_partitions(ray_session, fragment_files, tmp_path, monkeypatch):
    out = str(tmp_path / "out")
    tp.checkpointed_filter_scrub(fragment_files[:1], out)

    from hooqu_ray.stages import spec

    monkeypatch.setattr(spec, "MAX_PERPLEXITY", 30.0)
    _, counters = tp.checkpointed_filter_scrub(fragment_files[:1], out)
    assert counters["processed"] == 1  # fingerprint changed → recompute
