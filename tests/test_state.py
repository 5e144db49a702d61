"""Checkpoint/resume + metrics repository tests."""

import json
import os
import shutil

import pandas as pd
import pytest

import hooqu_ray as hq
from hooqu_ray.runner import do_analysis_run
from hooqu_ray.state.checkpoint import CheckpointedRun
from hooqu_ray.state.repository import FileSystemMetricsRepository, ResultKey


@pytest.fixture()
def fragments(tmp_path):
    paths = []
    for i in range(3):
        df = pd.DataFrame({"x": range(i * 10, i * 10 + 10), "t": [f"d{i}"] * 10})
        p = tmp_path / f"frag{i}.parquet"
        df.to_parquet(p)
        paths.append(str(p))
    return paths


class TestCheckpointedRun:
    def test_run_and_merge(self, ray_session, fragments, tmp_path):
        out = str(tmp_path / "out")
        run = CheckpointedRun(out, [hq.Size(), hq.Mean("x"), hq.Sum("x")])
        res = run.run(fragments)
        assert res == {"processed": 3, "skipped": 0, "total": 3}
        ctx = run.merged_metrics()
        vals = {a.name: m.value.get() for a, m in ctx.metric_map.items()}
        assert vals["Size"] == 30.0
        assert vals["Sum"] == sum(range(30))
        assert vals["Mean"] == sum(range(30)) / 30

    def test_resume_skips_committed(self, ray_session, fragments, tmp_path):
        out = str(tmp_path / "out")
        run1 = CheckpointedRun(out, [hq.Size()])
        run1.run(fragments[:2])
        # second run over all three fragments: first two already committed
        run2 = CheckpointedRun(out, [hq.Size()])
        res = run2.run(fragments)
        assert res["skipped"] == 2 and res["processed"] == 1
        assert run2.merged_metrics().all_metrics()[0].value.get() == 30.0

    def test_config_change_invalidates(self, ray_session, fragments, tmp_path):
        out = str(tmp_path / "out")
        CheckpointedRun(out, [hq.Size()]).run(fragments[:1])
        rerun = CheckpointedRun(out, [hq.Size(), hq.Mean("x")])
        res = rerun.run(fragments[:1])
        assert res["processed"] == 1  # hash mismatch → recomputed

    def test_interrupted_partition_not_committed(self, ray_session, fragments, tmp_path):
        out = str(tmp_path / "out")
        run = CheckpointedRun(out, [hq.Size()])
        run.run(fragments[:1])
        # simulate torn write: stale tmp dir + missing _SUCCESS
        part = os.path.join(out, "part=00001.tmp-deadbeef")
        os.makedirs(part, exist_ok=True)
        res = CheckpointedRun(out, [hq.Size()]).run(fragments[:2])
        assert res["processed"] == 1 and res["skipped"] == 1

    def test_transform_written(self, ray_session, fragments, tmp_path):
        out = str(tmp_path / "out")

        def transform(ds):
            return ds.map_batches(
                lambda t: t.filter(__import__("pyarrow").compute.greater(t.column("x"), 4)),
                batch_format="pyarrow",
            )

        run = CheckpointedRun(out, transform=transform)
        run.run(fragments[:1])
        import pyarrow.parquet as pq
        import glob

        files = glob.glob(os.path.join(out, "part=00000", "data", "*.parquet"))
        got = pd.concat(pd.read_parquet(f) for f in files)
        assert sorted(got["x"]) == list(range(5, 10))


class TestMetricsRepository:
    def test_save_load_history(self, tmp_path, df_with_numeric_values):
        repo = FileSystemMetricsRepository(str(tmp_path / "repo"))
        ctx = do_analysis_run(
            df_with_numeric_values, [hq.Mean("att1"), hq.Completeness("nope")]
        )
        key = ResultKey(dataset_ts=1000, tags={"env": "test"})
        path = repo.save(key, ctx)
        assert os.path.exists(path)

        doc = repo.load(key)
        by_name = {m["name"]: m for m in doc["metrics"]}
        assert by_name["Mean"]["value"] == 3.5
        assert by_name["Completeness"]["success"] is False
        assert "nope" in by_name["Completeness"]["error"]

        repo.save(ResultKey(dataset_ts=2000, tags={"env": "test"}), ctx)
        hist = repo.history()
        assert len(hist) == 4
        assert set(hist["dataset_ts"]) == {1000, 2000}
