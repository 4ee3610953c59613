"""Page-fetch contract: retry policy + bounded per-source concurrency (S2/S7).

The reference's harvester crawls each sitemap source over HTTP with a
per-source request-concurrency cap from the sitemap hint
(``geoconnex:max_request_concurrency``) and non-fatal retry/skip
accounting (reference userCode/lib/containers.py:62-76 crawl loop;
streaming download with exists-skip at userCode/assetGroups/config.py:
34-82).  This sandbox has no network, so the TRANSPORT is injectable —
``fetch_stage`` takes any ``transport(url) -> (status:int, body:bytes)``
callable — while the contract around it (retry schedule, status
classification, concurrency bound, error accounting) is real and tested.

Ray-Data-first shape:

* URLs arrive as a Dataset partitioned/sorted by ``source`` (the sitemap
  reader's deterministic key sort guarantees one source's URLs are
  contiguous), so a batch is dominated by one source and the per-source
  cap applies batch-locally: each batch fans its URLs over a thread pool
  of at most ``max_request_concurrency`` workers.  This mirrors the
  reference, where the cap exists to be polite to ONE origin server —
  it is a per-origin in-flight bound, not a global one, so enforcing it
  within each (single-source) batch is exactly the contract.  The
  documented partitioning assumption: batches must not interleave
  sources, or the cap degrades to per-batch-per-source (still bounded).
* The transport is I/O-bound, so threads (not processes) are right; the
  stage itself scales out as ordinary ``map_batches`` tasks.
* Retries: full-jitter-free deterministic exponential backoff
  (``backoff_s * 2**attempt``) on retryable statuses (429/5xx) and
  transport exceptions; 4xx (except 429) are permanent → error row, not
  a crash — the reference's non-fatal exit-3 accounting.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import pyarrow as pa

from ray.data import Dataset

#: statuses worth retrying (throttling / transient server errors)
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


@dataclass(frozen=True)
class FetchPolicy:
    """The retry/concurrency contract of the crawl loop."""

    max_retries: int = 3
    backoff_s: float = 0.5  # attempt n sleeps backoff_s * 2**n
    default_concurrency: int = 1  # per-source cap when no hint exists
    retry_statuses: frozenset = field(default_factory=lambda: RETRY_STATUSES)


def offline_transport(url: str) -> tuple[int, bytes]:
    """The honest no-network boundary (same pattern as the multimodal
    codec boundary): production wires an HTTP client here."""
    raise NotImplementedError(
        "no network in this environment — inject a transport(url) callable"
    )


def fetch_one(
    url: str,
    transport,
    policy: FetchPolicy,
    _sleep=time.sleep,
) -> tuple[int, bytes | None, str | None, int]:
    """(status, body, error, attempts) for one URL under the retry policy.

    * retryable status / transport exception → retry with exponential
      backoff, up to ``max_retries`` extra attempts;
    * permanent non-2xx → (status, None, "http:<status>", attempts);
    * exhausted retries → last status (or 0 on exception) + error.
    """
    attempts = 0
    err: str | None = None
    status = 0
    while True:
        attempts += 1
        try:
            status, body = transport(url)
        except NotImplementedError:
            raise
        except Exception as e:  # transport-level failure (DNS, reset, ...)
            status, body, err = 0, None, f"transport:{type(e).__name__}"
        else:
            if 200 <= status < 300:
                return status, body, None, attempts
            err = f"http:{status}"
        retryable = status == 0 or status in policy.retry_statuses
        if not retryable or attempts > policy.max_retries:
            return status, None, err, attempts
        _sleep(policy.backoff_s * (2 ** (attempts - 1)))


class PageFetcher:
    """Per-batch fetch kernel: bounded per-source fan-out + retries.

    ``source_concurrency`` maps source_id → max in-flight requests (the
    sitemap hint); a batch's URLs are grouped by source and each group
    runs on its own thread pool of that width, so no origin ever sees
    more than its cap in flight from one task.  State (transport, policy,
    caps) is constructed once per actor/worker, not per batch.
    """

    def __init__(
        self,
        transport=offline_transport,
        policy: FetchPolicy | None = None,
        source_concurrency: dict[str, int] | None = None,
        _sleep=time.sleep,
    ):
        self.transport = transport
        self.policy = policy or FetchPolicy()
        self.caps = source_concurrency or {}
        self._sleep = _sleep

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        sources = (
            batch["source"].to_pylist()
            if "source" in batch.column_names
            else [""] * len(urls)
        )
        results: list[tuple[int, bytes | None, str | None, int]] = [None] * len(urls)  # type: ignore[list-item]
        # group by source (contiguous by the partitioning assumption, but
        # grouping is correct either way) and bound each group separately
        groups: dict[str, list[int]] = {}
        for i, s in enumerate(sources):
            groups.setdefault(s, []).append(i)
        for s, idxs in groups.items():
            cap = max(1, int(self.caps.get(s, self.policy.default_concurrency)))
            if cap == 1 or len(idxs) == 1:
                for i in idxs:
                    results[i] = fetch_one(urls[i], self.transport, self.policy, self._sleep)
            else:
                with ThreadPoolExecutor(max_workers=cap) as ex:
                    for i, r in zip(
                        idxs,
                        ex.map(
                            lambda i: fetch_one(
                                urls[i], self.transport, self.policy, self._sleep
                            ),
                            idxs,
                        ),
                    ):
                        results[i] = r
        return (
            batch.append_column(
                "status", pa.array([r[0] for r in results], pa.int32())
            )
            .append_column("html", pa.array([r[1] for r in results], pa.binary()))
            .append_column(
                "fetch_error", pa.array([r[2] for r in results], pa.large_string())
            )
            .append_column(
                "attempts", pa.array([r[3] for r in results], pa.int32())
            )
        )


def fetch_stage(
    urls: Dataset,
    sources: "object | None" = None,
    *,
    transport=offline_transport,
    policy: FetchPolicy | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int | None = 256,
) -> Dataset:
    """urls(url, source) → + (status, html, fetch_error, attempts).

    ``sources`` is the sitemap sources table (needs ``source_id`` and
    ``max_request_concurrency``).  Runs as an actor pool — the transport
    (HTTP session, TLS pools) is per-actor state."""
    caps = {}
    if sources is not None:
        caps = dict(
            zip(sources["source_id"], (int(c) for c in sources["max_request_concurrency"]))
        )
    return urls.map_batches(
        PageFetcher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "transport": transport,
            "policy": policy,
            "source_concurrency": caps,
        },
        zero_copy_batch=True,
    )


def offline_stream_transport(url: str):
    """Streaming twin of ``offline_transport``: production wires an HTTP
    client returning ``(status, iterator-of-byte-chunks)``."""
    raise NotImplementedError(
        "no network in this environment — inject a stream_transport(url)"
    )


def download_file(
    url: str,
    dest: str,
    stream_transport=offline_stream_transport,
    *,
    policy: FetchPolicy | None = None,
    skip_if_exists: bool = True,
    log_every_bytes: int = 250 * 1024 * 1024,
    progress=None,
    _sleep=time.sleep,
) -> dict:
    """Streaming single-file download with exists-skip and periodic
    progress — the native contract behind the reference's mainstem
    hydrofabric pull (reference userCode/assetGroups/config.py:34-82:
    1 MB chunked ``requests`` stream, skip when the file exists, a log
    line every 250 MB).

    Differences from the reference, both deliberate: the whole request
    retries under the shared :class:`FetchPolicy` (the reference has no
    retry on this path), and bytes land in ``dest + ".tmp"`` renamed into
    place only on completion, so a crashed download never leaves a torn
    file that the exists-skip would then trust.

    ``stream_transport(url) -> (status, iter[bytes])``.  ``progress`` is
    called with the running byte count at every ``log_every_bytes``
    threshold.  Returns ``{"skipped", "bytes", "attempts"}``; raises
    ``IOError`` when the policy is exhausted.
    """
    import os

    policy = policy or FetchPolicy()
    if skip_if_exists and os.path.exists(dest):
        return {"skipped": True, "bytes": os.path.getsize(dest), "attempts": 0}
    attempts = 0
    while True:
        attempts += 1
        err: str | None
        try:
            status, chunks = stream_transport(url)
        except NotImplementedError:
            raise
        except Exception as e:
            status, chunks, err = 0, None, f"transport:{type(e).__name__}"
        else:
            err = None if 200 <= status < 300 else f"http:{status}"
        if err is None:
            n = 0
            next_log = log_every_bytes
            tmp = dest + ".tmp"
            try:
                with open(tmp, "wb") as f:
                    for chunk in chunks:
                        if not chunk:  # keep-alive chunks, as in the reference
                            continue
                        f.write(chunk)
                        n += len(chunk)
                        if progress is not None and n >= next_log:
                            progress(n)
                            next_log += log_every_bytes
            except Exception as e:  # mid-stream reset → retryable, like status 0
                status, err = 0, f"stream:{type(e).__name__}"
                if os.path.exists(tmp):
                    os.remove(tmp)
            else:
                os.replace(tmp, dest)
                return {"skipped": False, "bytes": n, "attempts": attempts}
        retryable = status == 0 or status in policy.retry_statuses
        if not retryable or attempts > policy.max_retries:
            raise IOError(f"download {url} failed after {attempts} attempts: {err}")
        _sleep(policy.backoff_s * (2 ** (attempts - 1)))
