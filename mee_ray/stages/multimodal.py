"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not in this container, so the
decode kernel is a clearly-marked deterministic fake
(:class:`FakeImageDecode.decode_real` raises NotImplementedError); what
IS real and tested is the Ray-side plumbing a 100 TB multimodal
pipeline needs: binary columns through Arrow batches, an actor-pool
stage with per-actor setup, small byte-aware batches, and a typed
metadata output schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class FakeImageDecode:
    """Actor-pool decode stage. __init__ = load-codec-once (here: a
    deterministic parameter table); __call__ = per-batch decode.

    Real decode is stubbed: plug in PIL/libjpeg by overriding
    :meth:`decode_real`."""

    def __init__(self):
        self.channels = 3  # stand-in for codec init

    def decode_real(self, payload: bytes) -> dict:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; FakeImageDecode.__call__ uses a deterministic "
            "stand-in so the pipeline plumbing is testable")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        n_bytes = np.array([len(p) for p in payloads], dtype=np.int64)
        # deterministic fake "decode": dimensions derived from size
        width = (n_bytes % 640) + 1
        height = ((n_bytes * 7) % 480) + 1
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bytes": pa.array(n_bytes),
            "width": pa.array(width),
            "height": pa.array(height),
            "channels": pa.array(np.full(len(n_bytes), self.channels, dtype=np.int64)),
        })


def multimodal_image_meta(sf_dir: str):
    """documents.text reinterpreted as an opaque binary payload column
    → actor-pool decode → typed metadata. SQL oracle replicates the
    deterministic fake via byte lengths."""
    import ray.data

    def to_payload(t: pa.Table) -> pa.Table:
        payloads = [x.encode() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(FakeImageDecode, batch_format="pyarrow",
                         batch_size=256, concurrency=(1, 4)))


MULTIMODAL_SQL = """
SELECT doc_id,
       strlen(text)              AS n_bytes,
       (strlen(text) % 640) + 1  AS width,
       ((strlen(text) * 7) % 480) + 1 AS height,
       3                         AS channels
FROM documents
"""
