"""Metrics repository: persist metrics per run, reload and compare.

Realizes the reference's planned-but-unimplemented MetricsRepository
(``hooqu/analyzers/runners/analysis_runner.py:67``, ``README.rst:154-157``,
``docs/key_concepts.rst:65-76``): each run's AnalyzerContext is stored under
a ``ResultKey`` (timestamp + tags) as one JSON document; the repository can
reload any run or produce a tidy history frame for trend checks.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional

import pandas as pd

from ..metrics import DoubleMetric, Entity, Failure, Success
from ..runner import AnalyzerContext


@dataclass(frozen=True)
class ResultKey:
    dataset_ts: int = field(default_factory=lambda: int(time.time() * 1000))
    tags: Mapping[str, str] = field(default_factory=dict)

    def filename(self) -> str:
        tag = "_".join(f"{k}-{v}" for k, v in sorted(self.tags.items()))
        return f"metrics_{self.dataset_ts}{('_' + tag) if tag else ''}.json"


def _metric_to_json(analyzer, metric: DoubleMetric) -> dict:
    v = metric.value
    return {
        "analyzer": repr(analyzer),
        "entity": metric.entity.name,
        "name": metric.name,
        "instance": metric.instance,
        "success": v.isSuccess,
        "value": v.get() if v.isSuccess else None,
        "error": None if v.isSuccess else str(v.failed().get()),
    }


class FileSystemMetricsRepository:
    """One JSON document per run under ``base_path`` (atomic writes)."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def save(self, key: ResultKey, context: AnalyzerContext) -> str:
        doc = {
            "dataset_ts": key.dataset_ts,
            "tags": dict(key.tags),
            "metrics": [
                _metric_to_json(a, m) for a, m in context.metric_map.items()
            ],
        }
        path = os.path.join(self.base_path, key.filename())
        fd, tmp = tempfile.mkstemp(dir=self.base_path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, indent=1, default=str)
        os.replace(tmp, path)  # atomic publish
        return path

    def load(self, key: ResultKey) -> Optional[dict]:
        path = os.path.join(self.base_path, key.filename())
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def load_all(self) -> List[dict]:
        docs = []
        for fn in sorted(os.listdir(self.base_path)):
            if fn.startswith("metrics_") and fn.endswith(".json"):
                with open(os.path.join(self.base_path, fn)) as f:
                    docs.append(json.load(f))
        return docs

    def history(self) -> pd.DataFrame:
        """Tidy frame over all runs: (dataset_ts, tags…, entity, instance,
        name, value, success) — the input for trend/anomaly checks."""
        rows = []
        for doc in self.load_all():
            for m in doc["metrics"]:
                row = {"dataset_ts": doc["dataset_ts"], **doc["tags"], **m}
                row.pop("analyzer", None)
                rows.append(row)
        return pd.DataFrame(rows)
