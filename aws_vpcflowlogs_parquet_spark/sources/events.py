"""Event-driven source discovery (reference main.go:87-135, SURVEY §2.1 R2).

The reference turns an S3 event — possibly wrapped in an SNS envelope — into
a list of input objects; records it cannot interpret are logged and skipped,
not errors (main.go:119-123). This module reproduces that contract as pure
driver-side config parsing: the output is the path list handed to
``spark.read.text`` (batch) or the drop directory watched by the streaming
source. No Spark dependency — discovery is metadata work, not dataflow.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class SourceTarget:
    """An input object location (reference S3Location, main.go:30-37)."""

    bucket: str
    key: str
    region: str = ""

    @property
    def path(self) -> str:
        # s3a:// is the Hadoop S3 connector scheme; tests use file:// buckets
        scheme = "file" if self.bucket.startswith("/") else "s3a"
        if scheme == "file":
            return f"{self.bucket}/{self.key}"
        return f"s3a://{self.bucket}/{self.key}"


def _s3_record_to_target(record: dict) -> SourceTarget | None:
    try:
        s3 = record["s3"]
        return SourceTarget(
            bucket=s3["bucket"]["name"],
            key=s3["object"]["key"],
            region=record.get("awsRegion", ""),
        )
    except (KeyError, TypeError):
        return None


def targets_from_event(event: dict | str) -> list[SourceTarget]:
    """S3 event or SNS-wrapped S3 event → input targets.

    Mirrors recordToTarget (main.go:87-135): SNS envelopes are unwrapped
    (main.go:89-107), raw S3 records read directly (main.go:108-118), and
    unsupported records are logged + skipped (main.go:119-123).
    """
    if isinstance(event, str):
        event = json.loads(event)
    targets: list[SourceTarget] = []
    for record in event.get("Records", []):
        if "Sns" in record:  # SNS envelope: Message is a JSON S3 event
            try:
                inner = json.loads(record["Sns"]["Message"])
            except (KeyError, TypeError, json.JSONDecodeError):
                logger.warning("skip unsupported SNS record: %r", record)
                continue
            targets.extend(targets_from_event(inner))
        elif "s3" in record:
            t = _s3_record_to_target(record)
            if t is None:
                logger.warning("skip unsupported S3 record: %r", record)
            else:
                targets.append(t)
        else:
            logger.warning("skip unsupported record: %r", record)
    return targets
