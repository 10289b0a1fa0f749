"""Local-filesystem delivery client: a BulkPutClient that persists every
bulk payload to a JSON file instead of calling AWS.

The engine's analog of running the reference plugin against localstack
(/root/reference/example/streams/docker-compose.yml uses localstack for
the same purpose): a drop-in stand-in for Kinesis during development and
tests. Works from executor processes — any shared filesystem.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path
from typing import Any


class FileDumpClient:
    """Acks everything; one `call-*.json` file per put_records call."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def put_records(self, records: list[dict[str, Any]]) -> dict[str, Any]:
        path = Path(self.out_dir) / f"call-{uuid.uuid4().hex}.json"
        path.write_text(json.dumps(records))
        return {"FailedRecordCount": 0, "Records": [{"ErrorCode": ""}] * len(records)}


class FlakyFileDumpClient(FileDumpClient):
    """Fails every record once (ErrorCode='simulated_error') before
    acking on retry — exercises the partial-failure retry path end-to-end
    (the reference's TestPublishWithSimulatedError scenario,
    streams/client_test.go:~200)."""

    def __init__(self, out_dir: str, state_dir: str):
        super().__init__(out_dir)
        self.state_dir = state_dir

    def put_records(self, records: list[dict[str, Any]]) -> dict[str, Any]:
        entries = []
        to_persist = []
        for rec in records:
            key = uuid.uuid5(uuid.NAMESPACE_OID, rec["data"]).hex
            marker = Path(self.state_dir) / f"seen-{key}"
            if marker.exists():
                entries.append({"ErrorCode": ""})
                to_persist.append(rec)
            else:
                marker.write_text("1")
                entries.append({"ErrorCode": "simulated_error"})
        if to_persist:
            path = Path(self.out_dir) / f"call-{uuid.uuid4().hex}.json"
            path.write_text(json.dumps(to_persist))
        failed = sum(1 for e in entries if e["ErrorCode"])
        return {"FailedRecordCount": failed, "Records": entries}
