"""`jsonl_audit` — a Python DataSource *writer* (Spark 4 DataSource API),
completing the custom-connector surface (the `health_simulator` source
covers the read side).

Demonstrates the task-commit protocol every distributed sink needs:
each task streams its partition to a private temp file and returns a
commit message; the driver's ``commit`` atomically publishes exactly the
acknowledged files (rename + ``_SUCCESS`` manifest) and sweeps orphaned
temps from failed/speculative attempts; ``abort`` removes everything.
Readers only trust published ``part-*.jsonl`` files, so a job that dies
mid-write leaves no visible output — the same contract as Hadoop
FileOutputCommitter v1.

Usage::

    df.write.format("jsonl_audit").mode("append").option("path", out).save()
    spark.read.schema(sch).json(out)   # round-trip
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_audit requires option('path', ...)")
        self.fail = options.get("fail", "false").lower() == "true"
        self.overwrite = overwrite
        # published names carry a per-job id: two append jobs must not
        # both publish part-00000.jsonl (the second would clobber the
        # first via os.replace)
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tmp = f"_tmp_{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as fh:
            for row in iterator:
                if self.fail:
                    raise RuntimeError("injected task failure")
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        # a zero-partition job never runs write(), so the directory may not
        # exist yet — commit must still publish an (empty) _SUCCESS
        os.makedirs(self.path, exist_ok=True)
        total = 0
        published = []
        if self.overwrite:
            # overwrite contract: this job's output replaces ALL prior
            # parts, including high-numbered ones from a larger job
            for f in os.listdir(self.path):
                if (f.startswith("part-") and f.endswith(".jsonl")) or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        elif os.path.exists(os.path.join(self.path, "_SUCCESS")):
            # append contract: prior jobs' files stay published and the
            # manifest accumulates
            with open(os.path.join(self.path, "_SUCCESS")) as fh:
                prev = json.load(fh)
            published = list(prev.get("files", []))
            total = int(prev.get("rows", 0))
        for i, m in enumerate(messages):
            final = f"part-{i:05d}-{self.job_id}.jsonl"
            os.replace(os.path.join(self.path, m.tmp_name), os.path.join(self.path, final))
            published.append({"file": final, "rows": m.n_rows})
            total += m.n_rows
        # sweep temps from failed/speculative attempts
        for f in os.listdir(self.path):
            if f.startswith("_tmp_"):
                os.remove(os.path.join(self.path, f))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump({"rows": total, "files": published}, fh)

    def abort(self, messages):
        if not os.path.isdir(self.path):
            return
        for f in os.listdir(self.path):
            if f.startswith("_tmp_"):
                os.remove(os.path.join(self.path, f))


class JsonlAuditDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlAuditDataSource)
