"""HTTP fan-out sink for SCD2 insert side-outputs.

Literal parity with the reference's new-customer flow
(``adf/pipeline.json:364-441``): a Lookup feeds a ForEach whose
WebActivity POSTs ``{"name": ..., "email": ...}`` per new row with a
``Content-Type: application/json`` header. Here the same flow is an
``on_insert`` callback factory — plug the result into
``Scd2Table(on_insert=...)`` / ``Pipeline(on_insert={...})`` and each
upsert's INSERT subset fans out as one POST per row.

Transport is injectable (tests record payloads; production uses the
stdlib urllib default) — the sandbox has no network, and the unit of
behavior worth testing is the payload sequence, not the socket.

Scale note: the fan-out is driver-side and per-row BY DESIGN — it
mirrors a control-plane notification (welcome emails for the handful of
customers new in this run), not a data-plane write. ``max_rows`` makes
that contract explicit: a run whose insert set exceeds it raises rather
than silently launching an unbounded HTTP storm from the driver.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 10_000


DEFAULT_TIMEOUT_SECONDS = 30.0


def _urllib_transport(
    url: str,
    body: bytes,
    headers: Mapping[str, str],
    timeout: float = DEFAULT_TIMEOUT_SECONDS,
) -> int:
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=dict(headers), method="POST")
    # A bounded timeout so one hung endpoint can't wedge the driver (and
    # with it the whole SCD2 upsert) mid-fan-out.
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.status


def http_post_sink(
    url: str,
    fields: Sequence[str] = ("name", "email"),
    *,
    headers: Mapping[str, str] | None = None,
    transport: Callable[[str, bytes, Mapping[str, str]], int] | None = None,
    max_rows: int = DEFAULT_MAX_ROWS,
    timeout: float = DEFAULT_TIMEOUT_SECONDS,
) -> Callable[[DataFrame], None]:
    """Build an ``on_insert`` callback that POSTs one JSON object per
    inserted row, with the given columns as the payload keys.

    The reference body is built per item as ``{"name": @{item().Name},
    "email": @{item().Email}}`` (``adf/pipeline.json:432-436``); rows
    POST in a deterministic order (sorted by the payload's field values)
    so retries and tests see a stable sequence — ADF's ForEach runs
    sequential by default (``isSequential`` unset ⇒ batchCount 20;
    ordering within the run is an implementation detail we pin down).
    """
    send = transport or (
        lambda url, body, headers: _urllib_transport(url, body, headers, timeout)
    )
    hdrs = {"Content-Type": "application/json", **(headers or {})}
    cols = list(fields)

    def callback(inserts: DataFrame) -> None:
        rows = inserts.select(*cols).take(max_rows + 1)
        if len(rows) > max_rows:
            raise RuntimeError(
                f"http_post_sink: insert set exceeds max_rows={max_rows}; "
                "this sink is for control-plane fan-out, not bulk export"
            )
        for row in sorted(rows, key=lambda r: tuple(str(r[c]) for c in cols)):
            body = json.dumps({c: row[c] for c in cols}).encode("utf-8")
            send(url, body, hdrs)

    return callback
