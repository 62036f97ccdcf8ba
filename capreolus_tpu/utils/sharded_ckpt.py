"""Sharded, optionally-asynchronous checkpoints for multi-chip training.

The flat checkpoint path (``flax.serialization.to_bytes``) gathers every leaf
to one host: on a multi-host mesh (trainer.fsdp / tp / pp shardings) that
gather either holds the whole unsharded model+optimizer in ONE host's RAM or
raises outright on non-fully-addressable arrays. Production TPU checkpointing
writes each process's ADDRESSABLE shards and reassembles on load — the
orbax/tensorstore design, built here from scratch on raw ``.npy`` files:

- :func:`save_sharded` writes one raw ``.npy`` per (leaf, unique shard) plus a
  ``manifest.json`` describing the tree (flattened key paths, global
  shape/dtype, per-shard global index ranges). Replicated leaves write ONE
  copy (``shard.replica_id == 0`` dedupe); a leaf sharded 8 ways writes 8
  slab files that never existed as a single host array. Atomic via tmp-dir
  rename + done file (the repo-wide done-file protocol).
- :func:`load_sharded` reassembles by global index ranges, so a checkpoint
  saved under one mesh layout restores under ANY other (or onto plain host
  arrays): fsdp-8 -> tp-4 x dp-2 resharding is just different slices of the
  same global ranges. Shard files are memory-mapped during assembly, so peak
  host RAM is one leaf, not one tree.
- :class:`AsyncCheckpointer` moves the file IO off the training loop's
  critical path: ``save()`` snapshots device shards to host (the unavoidable
  device->host copy, started async for every shard before any blocking sync)
  and a daemon thread does the writes; ``wait()`` joins before the next save
  so two writers never interleave.

Reference parity anchor: per-iteration checkpoint/resume semantics are the
reference trainer's (pytorch.py:120-135 torch.save per iteration); this is the
storage layer that survives meshes the reference's single-file torch.save
cannot. The frozen-leaf skipping (reranker.trainable) happens in the trainer
before trees reach this module.

Multi-host note: every process calls save_sharded with the same directory on a
shared filesystem; per-shard filenames embed the owning process index so
writers never collide, and only process 0 finalizes the rename + done file
(the single-controller pattern). In this repo's test environment all shards
are process-0-addressable (8 virtual devices on one host), which exercises the
same code path.
"""

from __future__ import annotations

import json
import shutil
import threading
from pathlib import Path

import numpy as np

from capreolus_tpu.utils.loginit import get_logger

logger = get_logger(__name__)

MANIFEST = "manifest.json"
DONE = "done"


def _path_str(key_path) -> str:
    """Flatten a jax tree_util KeyPath to a stable string ("a/b/0")."""
    parts = []
    for p in key_path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _index_ranges(index, shape):
    """Normalize a shard's global index (tuple of slices) to explicit
    [(start, stop), ...] per dimension."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return out


def _snapshot_tree(tree):
    """Flatten a pytree and snapshot every leaf's unique shards to HOST arrays.

    Returns (manifest_leaves, blocks) where blocks maps filename -> np.ndarray.
    Device->host copies for jax.Arrays are started asynchronously for ALL
    shards before the first blocking materialization, so the transfers overlap
    (the same copy_to_host_async pattern as the scoring engine's results).
    """
    import jax

    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    pending = []  # (leaf_entry, filename, shard_data_or_nparray)
    manifest_leaves = []
    for li, (key_path, leaf) in enumerate(leaves):
        path = _path_str(key_path)
        arr_like = leaf
        entry = {"path": path, "shape": None, "dtype": None, "shards": []}
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            entry["shape"] = list(leaf.shape)
            entry["dtype"] = _dtype_str(leaf.dtype)
            wrote_any = False
            for si, shard in enumerate(leaf.addressable_shards):
                if shard.replica_id != 0:
                    continue  # replicated copy: one writer per unique slice
                fn = f"{li:05d}_{si:03d}_p{_proc_index(jax)}.npy"
                entry["shards"].append(
                    {"file": fn, "ranges": _index_ranges(shard.index, leaf.shape)})
                shard.data.copy_to_host_async()
                pending.append((fn, shard.data))
                wrote_any = True
            if not wrote_any:
                # every local replica_id > 0 (this process holds only redundant
                # copies); another process owns the primary. Nothing to write.
                pass
        else:
            a = np.asarray(arr_like)
            entry["shape"] = list(a.shape)
            entry["dtype"] = _dtype_str(a.dtype)
            fn = f"{li:05d}_000_p{_proc_index(jax)}.npy"
            entry["shards"].append(
                {"file": fn, "ranges": [(0, d) for d in a.shape]})
            pending.append((fn, a))
        manifest_leaves.append(entry)

    blocks = {}
    for fn, data in pending:
        blocks[fn] = np.asarray(data)  # blocking materialize (copies overlap)
    return manifest_leaves, blocks


def _dtype_str(dt):
    return str(dt)


def _proc_index(jax_mod):
    try:
        return int(jax_mod.process_index())
    except Exception:
        return 0


def _write_blocks(out_dir: Path, manifest_leaves, blocks, finalize: bool):
    """File IO half of a save (runs on the async thread when async_=True)."""
    out_dir = Path(out_dir)
    tmp = out_dir.parent / (out_dir.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    for fn, a in blocks.items():
        # bf16 is an ml_dtypes extension numpy can't round-trip through the
        # npy header portably: store the raw 2-byte view (the manifest keeps
        # the real dtype name for the load-side view back)
        if str(a.dtype) == "bfloat16":
            a = a.view(np.uint16)
        np.save(tmp / fn, a)
    (tmp / MANIFEST).write_text(json.dumps({"leaves": manifest_leaves}))
    if finalize:
        if out_dir.exists():
            shutil.rmtree(out_dir)
        tmp.rename(out_dir)
        (out_dir / DONE).write_text("done")


def save_sharded(out_dir, tree, async_checkpointer=None):
    """Write ``tree`` as a sharded checkpoint directory.

    With ``async_checkpointer`` the device->host snapshot happens NOW (so the
    caller may immediately mutate/donate the arrays) and the file writes run
    on its background thread; otherwise the write is synchronous.
    """
    import jax

    manifest_leaves, blocks = _snapshot_tree(tree)
    finalize = _proc_index(jax) == 0
    if async_checkpointer is not None:
        async_checkpointer._submit(Path(out_dir), manifest_leaves, blocks, finalize)
    else:
        _write_blocks(Path(out_dir), manifest_leaves, blocks, finalize)


def is_sharded_checkpoint(path) -> bool:
    path = Path(path)
    return (path / MANIFEST).exists()


def _assemble_leaf(in_dir: Path, entry) -> np.ndarray:
    """Reassemble one leaf from its shard files by global index ranges; shard
    files are memory-mapped so peak host RAM is one leaf, not one tree."""
    dtype = entry["dtype"]
    np_dtype = np.uint16 if dtype == "bfloat16" else np.dtype(dtype)
    full = np.empty(entry["shape"], dtype=np_dtype)
    for sh in entry["shards"]:
        block = np.load(in_dir / sh["file"], mmap_mode="r")
        sel = tuple(slice(a, b) for a, b in sh["ranges"])
        full[sel] = block
    if dtype == "bfloat16":
        import ml_dtypes

        full = full.view(ml_dtypes.bfloat16)
    return full


def restore_nested(in_dir):
    """Rebuild a dict-only tree (e.g. a flax params tree) from a sharded
    checkpoint WITHOUT a template, by splitting the manifest's flattened key
    paths. Trees containing tuples/lists (optimizer states) need
    :func:`load_sharded` with a ``like`` template instead."""
    in_dir = Path(in_dir)
    manifest = json.loads((in_dir / MANIFEST).read_text())
    out = {}
    for entry in manifest["leaves"]:
        node = out
        parts = entry["path"].split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = _assemble_leaf(in_dir, entry)
    return out


def restore_params(ckpt_path):
    """Load a checkpoint's tree whether flat (flax msgpack file) or sharded
    (directory) — the one entry point searcher ``checkpointfile`` options use,
    so checkpoints written with trainer.ckpt=sharded serve directly."""
    p = Path(ckpt_path)
    if p.is_dir():
        cand = p if is_sharded_checkpoint(p) else None
        if cand is None:
            raise ValueError(f"{p} is a directory but not a sharded checkpoint (no {MANIFEST})")
        return restore_nested(cand)
    from flax import serialization

    return serialization.msgpack_restore(p.read_bytes())


def load_sharded(in_dir, like=None, shardings=None):
    """Reassemble a sharded checkpoint.

    - ``like``: a pytree with the SAME structure as the saved tree; required
      to rebuild the tree (the manifest stores flattened key paths and they
      are asserted to match, so a structure drift fails loudly instead of
      silently permuting leaves).
    - ``shardings``: optional pytree (same structure) of jax.sharding.Sharding
      (or None per leaf) — leaves are jax.device_put onto them, which is how a
      checkpoint saved under one mesh layout restores under another: assembly
      is by GLOBAL index ranges, placement is the target's own sharding.
      Without it, host numpy arrays are returned.
    """
    import jax

    in_dir = Path(in_dir)
    manifest = json.loads((in_dir / MANIFEST).read_text())
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    if len(leaves) != len(manifest["leaves"]):
        raise ValueError(
            f"sharded checkpoint {in_dir} has {len(manifest['leaves'])} leaves; "
            f"the template tree has {len(leaves)}")
    shard_leaves = (jax.tree_util.tree_flatten(shardings, is_leaf=lambda x: x is None)[0]
                    if shardings is not None else [None] * len(leaves))

    out = []
    for (key_path, tmpl), entry, target in zip(leaves, manifest["leaves"], shard_leaves):
        path = _path_str(key_path)
        if path != entry["path"]:
            raise ValueError(f"checkpoint leaf order mismatch: template {path!r} "
                             f"vs saved {entry['path']!r}")
        full = _assemble_leaf(in_dir, entry)
        if target is not None:
            full = jax.device_put(full, target)
        out.append(full)
    return jax.tree_util.tree_unflatten(treedef, out)


class AsyncCheckpointer:
    """Serializes checkpoint writes onto one daemon thread.

    save_sharded(..., async_checkpointer=ckpt) returns as soon as the
    device->host snapshot is on the host; the .npy writes + atomic rename +
    done file happen in the background. A second save (or :meth:`wait`) joins
    the previous write first, so directories never interleave and the done
    file always covers a complete tree set.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def _enqueue(self, fn, what):
        prev = self._thread

        def run():
            if prev is not None:
                prev.join()
            if self._error is not None:
                return  # an earlier write in this chain failed; don't finalize
            try:
                fn()
            except Exception as e:  # surfaced on the next wait()
                self._error = e
                logger.error("async checkpoint write (%s) failed: %s", what, e)

        t = threading.Thread(target=run, name="ckpt-writer", daemon=True)
        self._thread = t
        t.start()

    def _submit(self, out_dir, manifest_leaves, blocks, finalize):
        self._enqueue(lambda: _write_blocks(out_dir, manifest_leaves, blocks, finalize),
                      str(out_dir))

    def after(self, fn):
        """Run ``fn`` on the writer thread once every submitted write before it
        has completed — e.g. the trainer's checkpoint-level done file, which
        must cover the params AND optimizer trees."""
        self._enqueue(fn, "after-hook")

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
