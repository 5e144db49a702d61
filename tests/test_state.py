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


class TestAnomalyDetection:
    """Deequ-style anomaly checks over the metrics repository (the
    reference's planned-but-missing addAnomalyCheck surface)."""

    def _seed_history(self, tmp_path, values):
        import pandas as pd

        import hooqu_ray as hq
        from hooqu_ray.runner import do_analysis_run
        from hooqu_ray.state.repository import FileSystemMetricsRepository, ResultKey

        repo = FileSystemMetricsRepository(str(tmp_path / "metrics"))
        size = hq.Size()
        for ts, n in enumerate(values):
            ctx = do_analysis_run(pd.DataFrame({"x": range(n)}), [size])
            repo.save(ResultKey(dataset_ts=ts), ctx)
        return repo, size

    def _context_for(self, n):
        import pandas as pd

        import hooqu_ray as hq
        from hooqu_ray.runner import do_analysis_run

        size = hq.Size()
        return size, do_analysis_run(pd.DataFrame({"x": range(n)}), [size])

    def test_relative_rate_of_change(self, tmp_path):
        from hooqu_ray.state.anomaly import RelativeRateOfChangeStrategy, check_anomaly

        repo, _ = self._seed_history(tmp_path, [100, 110, 120])
        strategy = RelativeRateOfChangeStrategy(min_rate=0.8, max_rate=1.25)
        a, ok_ctx = self._context_for(130)
        assert not check_anomaly(repo, a, ok_ctx, strategy).is_anomalous
        a, bad_ctx = self._context_for(50)  # dropped to 42% of last run
        res = check_anomaly(repo, a, bad_ctx, strategy)
        assert res.is_anomalous and res.baseline == 120.0

    def test_absolute_change(self, tmp_path):
        from hooqu_ray.state.anomaly import AbsoluteChangeStrategy, check_anomaly

        repo, _ = self._seed_history(tmp_path, [100])
        strategy = AbsoluteChangeStrategy(max_decrease=10, max_increase=10)
        a, ctx = self._context_for(95)
        assert not check_anomaly(repo, a, ctx, strategy).is_anomalous
        a, ctx = self._context_for(150)
        assert check_anomaly(repo, a, ctx, strategy).is_anomalous

    def test_online_normal(self, tmp_path):
        from hooqu_ray.state.anomaly import OnlineNormalStrategy, check_anomaly

        repo, _ = self._seed_history(tmp_path, [100, 102, 98, 101, 99])
        strategy = OnlineNormalStrategy(n_sigmas=3.0)
        a, ctx = self._context_for(101)
        assert not check_anomaly(repo, a, ctx, strategy).is_anomalous
        a, ctx = self._context_for(160)
        assert check_anomaly(repo, a, ctx, strategy).is_anomalous

    def test_no_history_not_anomalous(self, tmp_path):
        from hooqu_ray.state.anomaly import RelativeRateOfChangeStrategy, check_anomaly
        from hooqu_ray.state.repository import FileSystemMetricsRepository

        repo = FileSystemMetricsRepository(str(tmp_path / "empty"))
        strategy = RelativeRateOfChangeStrategy(min_rate=0.5)
        a, ctx = self._context_for(10)
        res = check_anomaly(repo, a, ctx, strategy)
        assert not res.is_anomalous and res.baseline is None

    def test_failed_metric_is_anomalous(self, tmp_path):
        import pandas as pd

        import hooqu_ray as hq
        from hooqu_ray.runner import do_analysis_run
        from hooqu_ray.state.anomaly import AbsoluteChangeStrategy, check_anomaly
        from hooqu_ray.state.repository import FileSystemMetricsRepository

        repo = FileSystemMetricsRepository(str(tmp_path / "m"))
        bad = hq.Mean("missing_column")
        ctx = do_analysis_run(pd.DataFrame({"x": [1.0]}), [bad])
        assert check_anomaly(repo, bad, ctx, AbsoluteChangeStrategy(1, 1)).is_anomalous

    def test_tags_isolate_histories(self, tmp_path):
        """Code-review r2c: runs of different tagged datasets in one
        repository must not merge into a single history series."""
        import pandas as pd

        import hooqu_ray as hq
        from hooqu_ray.runner import do_analysis_run
        from hooqu_ray.state.anomaly import RelativeRateOfChangeStrategy, check_anomaly
        from hooqu_ray.state.repository import FileSystemMetricsRepository, ResultKey

        repo = FileSystemMetricsRepository(str(tmp_path / "m"))
        size = hq.Size()
        for ts, (ds_tag, n) in enumerate([("a", 1000), ("b", 10), ("a", 1100)]):
            ctx = do_analysis_run(pd.DataFrame({"x": range(n)}), [size])
            repo.save(ResultKey(dataset_ts=ts, tags={"ds": ds_tag}), ctx)
        strategy = RelativeRateOfChangeStrategy(min_rate=0.5, max_rate=2.0)
        a, ctx = self._context_for(12)  # vs dataset b's last run (10): fine
        res_b = check_anomaly(repo, a, ctx, strategy, tags={"ds": "b"})
        assert not res_b.is_anomalous and res_b.baseline == 10.0
        # untagged lookup would compare 12 against a's 1100 and false-alarm
        assert check_anomaly(repo, a, ctx, strategy).is_anomalous

    def test_negative_baseline_direction(self):
        """Code-review r2c: an INCREASE from a negative baseline must not
        register as a rate drop."""
        from hooqu_ray.state.anomaly import RelativeRateOfChangeStrategy

        s = RelativeRateOfChangeStrategy(min_rate=0.8, max_rate=1.6)
        up = s.evaluate([-0.5], -0.25)  # moved up by 50% of |last|
        assert not up.is_anomalous and "rate=1.5" in up.detail
        down = s.evaluate([-0.5], -1.0)  # moved down by 100% of |last|
        assert down.is_anomalous
