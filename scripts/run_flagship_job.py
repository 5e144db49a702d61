"""ray-job-submittable flagship entrypoint: resumable transcript
quality-filter + scrub over partitioned Parquet.

    ray job submit --working-dir . -- \
        python scripts/run_flagship_job.py INPUT_DIR OUT_DIR

``INPUT_DIR``: directory of transcript parquet fragments (columns
``conv_id, turn_idx, role, text, tool, ts`` — the input_hint shape); each
fragment becomes one committed output partition (``part=<i>`` with an
atomic ``_SUCCESS`` marker + checkpointed per-partition analyzer states),
so a re-run after a failure SKIPS finished partitions and a spec/threshold
change (config fingerprint) invalidates them.  Corpus-level quality
metrics merge from the saved states without touching the data again.

On a cluster the driver attaches via ``RAY_ADDRESS`` (set by the job
runtime); standalone it starts a local session.  Prints ONE JSON summary
line on stdout.
"""

import glob
import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    in_dir, out_dir = sys.argv[1], sys.argv[2]
    fragments = sorted(
        glob.glob(os.path.join(in_dir, "*.parquet"))
        or glob.glob(in_dir)
    )
    if not fragments:
        print(f"no parquet fragments under {in_dir!r}", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False, log_to_driver=False,
        )
    try:
        from hooqu_ray.pipelines.transcripts import checkpointed_filter_scrub

        run, counters = checkpointed_filter_scrub(fragments, out_dir)
        ctx = run.merged_metrics()
        metrics = {
            f"{a.name}:{a.instance}": round(float(m.value.get()), 6)
            for a, m in ctx.metric_map.items()
            if m.value.isSuccess
        }
        print(json.dumps({**counters, "out_dir": out_dir, "metrics": metrics}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
