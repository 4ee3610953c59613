"""Publishing dry-run manifests (S11-S13) — the exact file sets, tags and
commands the reference pushes to external registries, emitted as pure data.

The reference publishes its release graphs three ways:

* **OCI artifact** (S11) — ``oras push`` of every ``*.nq`` / ``*.nq.gz`` to
  GHCR with a date tag + ``latest`` (reference
  ``userCode/assetGroups/export.py:244-297``).
* **lakeFS copy** (S12) — rclone copy with include ``*.nq``/``*.nq.gz`` and
  exclude ``*.bytesum`` into a per-release branch, after clearing the
  destination prefix, then a branch commit (reference
  ``userCode/lib/classes.py:267-345``).
* **Zenodo deposit** (S13) — per-file bucket PUTs (``.bytesum`` silently
  skipped, other non-nq files warn-skipped) plus a fixed metadata document
  (reference ``userCode/assetGroups/export.py:423-540``).

Actually pushing to ghcr.io / lakeFS / zenodo.org is out of scope for this
engine (no network, no registries); what a user needs from the engine is
the *manifest* — which files, which tags, which filters, which command —
so a thin runner (CI job, operator) can execute the push.  Every function
here is deterministic pure data over a directory listing: no network, no
subprocess, no clock (callers pass the release date)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

__all__ = [
    "list_release_files",
    "oci_push_manifest",
    "lakefs_copy_manifest",
    "zenodo_deposit_manifest",
]

#: the reference's include set for every publishing path: release graphs
#: are n-quads, plain or gzipped (classes.py:313-317, export.py:255-257)
NQ_SUFFIXES = (".nq", ".nq.gz")
#: the reference's exclude: incremental-pull checksum sidecars never
#: publish (classes.py:318-319, export.py:479-481)
EXCLUDE_SUFFIX = ".bytesum"


def _is_nq(name: str) -> bool:
    return name.endswith(NQ_SUFFIXES[0]) or name.endswith(NQ_SUFFIXES[1])


def list_release_files(graph_dir: str) -> list[str]:
    """Sorted top-level file names of a release directory (the reference
    iterates ``GEOCONNEX_GRAPH_DIRECTORY.iterdir()`` non-recursively)."""
    return sorted(
        f for f in os.listdir(graph_dir) if os.path.isfile(os.path.join(graph_dir, f))
    )


@dataclass
class PushManifest:
    """What WOULD be pushed: target + per-file entries + skipped files."""

    target: str
    files: list[dict] = field(default_factory=list)
    skipped: list[dict] = field(default_factory=list)
    metadata: dict = field(default_factory=dict)
    command: str = ""


def oci_push_manifest(
    graph_dir: str, *, date_str: str, test_mode: bool = False
) -> PushManifest:
    """S11 dry run: the ``oras push`` the reference would run
    (export.py:249-262) — date + ``latest`` tags, every ``*.nq``/``*.nq.gz``
    as an ``application/n-quads`` layer, the two image annotations.
    ``date_str`` is the ``YYYY_MM_DD`` release date (caller-supplied so the
    manifest is deterministic)."""
    registry = "localhost:5000" if test_mode else "ghcr.io"
    target = f"{registry}/internetofwater/geoconnex-graph:{date_str},latest"
    man = PushManifest(
        target=target,
        metadata={
            "annotations": {
                "org.opencontainers.image.description": (
                    "All RDF data in NQuad format which makes up the "
                    "Geoconnex Graph as of the date in the image tag"
                ),
                "org.opencontainers.image.source": "https://github.com/internetofwater/geoconnex.us",
            }
        },
    )
    layers = []
    for name in list_release_files(graph_dir):
        if _is_nq(name):
            man.files.append({"file": name, "media_type": "application/n-quads"})
            layers.append(f"{name}:application/n-quads")
        else:
            man.skipped.append({"file": name, "reason": "not *.nq / *.nq.gz"})
    man.command = f"oras push {target} {' '.join(layers)}"
    return man


def lakefs_copy_manifest(
    graph_dir: str,
    *,
    source_prefix: str,
    destination_branch: str,
    destination_prefix: str | None = None,
    bucket: str = "iow",
    test_mode: bool = False,
) -> PushManifest:
    """S12 dry run: the rclone copy the reference runs into a lakeFS branch
    (classes.py:297-330) — destination cleared first, include
    ``*.nq``/``*.nq.gz``, exclude ``*.bytesum``, then a branch commit whose
    message embeds the source prefix."""
    src = f"{'s3' if test_mode else 'gs'}:{bucket}/{source_prefix}"
    dst = f"lakefs:geoconnex/{destination_branch}"
    if destination_prefix:
        dst = f"{dst}/{destination_prefix}"
    man = PushManifest(
        target=dst,
        metadata={
            "pre_steps": [
                f"create_branch_if_not_exists({destination_branch})",
                f"remove_files_in_directory({destination_branch}, {destination_prefix})",
            ],
            "commit_message": (
                f"Adding .nq/.nq.gz files from {source_prefix} "
                "automatically from the geoconnex scheduler"
            ),
        },
    )
    for name in list_release_files(graph_dir):
        if name.endswith(EXCLUDE_SUFFIX):
            man.skipped.append({"file": name, "reason": "--exclude *.bytesum"})
        elif _is_nq(name):
            man.files.append({"file": name, "media_type": "application/n-quads"})
        else:
            man.skipped.append({"file": name, "reason": "no --include rule matches"})
    man.command = (
        f"rclone copy {src} {dst} -v --include *.nq --include *.nq.gz "
        f"--exclude *.bytesum --s3-upload-concurrency 8"
    )
    return man


def zenodo_deposit_manifest(graph_dir: str) -> PushManifest:
    """S13 dry run: the per-file bucket PUTs + deposit metadata of the
    reference's Zenodo upload (export.py:465-522).  ``.bytesum`` sidecars
    are silently skipped; any other non-nq file is warn-skipped (the
    reference logs a warning and continues)."""
    man = PushManifest(
        target="zenodo:deposit/geoconnex-graph",
        metadata={
            "metadata": {
                "title": "Geoconnex Graph",
                "upload_type": "dataset",
                "description": (
                    "These files file represent the n-quads export of all RDF "
                    "data in each sitemap, which makes up the Geoconnex graph "
                    "database. Documentation and background can be found at "
                    "https://docs.geoconnex.us"
                ),
                "creators": [
                    {
                        "name": "Internet of Water Coalition",
                        "affiliation": "Internet of Water Coalition",
                    }
                ],
            }
        },
    )
    for name in list_release_files(graph_dir):
        if name.endswith(EXCLUDE_SUFFIX):
            continue  # silent skip, matching export.py:479-481
        if not _is_nq(name):
            man.skipped.append(
                {"file": name, "reason": "warn: not a .nq or .nq.gz file"}
            )
            continue
        size = os.path.getsize(os.path.join(graph_dir, name))
        man.files.append({"file": name, "size_bytes": size, "method": "PUT bucket"})
    return man
