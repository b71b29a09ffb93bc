"""Unified training data sources and combined-dataset epochs.

The reference trains DiffDock-L on PDBBind, Binding MOAD and the PDB
sidechain (van der Mers) set simultaneously (``--combined_training`` /
``--triple_training``; ``datasets/loader.py:30-122`` with
``CombineDatasets`` concatenation). Here every dataset exposes one epoch of
``(name, ComplexData)`` items; the combined source interleaves member
epochs in a seeded shuffled order, and a streaming bucketizer groups items
into same-shape padded batches so every batch hits one jit compilation.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from diffdock_tpu.data.complexes import ComplexData, bucket_sizes, pad_to

_FIELDS = ComplexData._fields


class PDBBindSource:
    """Adapter over :class:`diffdock_tpu.data.datasets.ComplexDataset`."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self) -> int:
        return len(self.dataset)

    def epoch_items(self, seed: int) -> Iterator[Tuple[str, ComplexData]]:
        names = list(self.dataset.names)
        np.random.RandomState(seed).shuffle(names)
        for name in names:
            yield name, self.dataset.get(name)


class EpochIteratorSource:
    """Adapter over MOADDataset / PDBSidechainDataset (cluster / contact
    sampled epochs)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self) -> int:
        return len(self.dataset)

    def epoch_items(self, seed: int) -> Iterator[Tuple[str, ComplexData]]:
        yield from self.dataset.epoch_iterator(seed)


class CombinedSource:
    """Interleave several sources in one epoch (reference CombineDatasets +
    DataLoader shuffle: every member item appears once, order mixed)."""

    def __init__(self, sources: Sequence):
        self.sources = list(sources)

    def __len__(self) -> int:
        return sum(len(s) for s in self.sources)

    def epoch_items(self, seed: int) -> Iterator[Tuple[str, ComplexData]]:
        rng = np.random.RandomState(seed)
        schedule = np.concatenate([
            np.full(len(s), i, np.int32) for i, s in enumerate(self.sources)
        ])
        rng.shuffle(schedule)
        iters = [s.epoch_items(seed + 17 * i)
                 for i, s in enumerate(self.sources)]
        for si in schedule:
            try:
                yield next(iters[si])
            except StopIteration:
                continue


def iter_bucketed_batches(
    items: Iterator[Tuple[str, ComplexData]],
    batch_size: int,
    flush_partial: bool = True,
) -> Iterator[Tuple[List[str], ComplexData]]:
    """Group a stream of complexes into same-bucket padded stacked batches.

    A batch is emitted as soon as a bucket fills; leftovers flush at end of
    stream (smaller final batches recompile once per (bucket, size) — the
    same compilation discipline as ComplexDataset.bucketed_batches).
    """
    pending: Dict[Tuple[int, int, int], List[Tuple[str, ComplexData]]] = {}
    for name, data in items:
        if data is None:
            continue
        b = bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
        pending.setdefault(b, []).append((name, data))
        if len(pending[b]) >= batch_size:
            yield _stack(pending.pop(b), b)
    if flush_partial:
        for b, members in pending.items():
            if members:
                yield _stack(members, b)


def _stack(members, bucket):
    nl, nr, nb = bucket
    names = [n for n, _ in members]
    # normalize bonded-neighbor width across molecules (hypervalent atoms
    # can exceed the default 4)
    kb = max(4, *(d.lig_bond_nbr.shape[1] for _, d in members))
    kr = max(d.rec_nbr.shape[1] for _, d in members)
    datas = [pad_to(d, nl, nr, nb, kb=kb, kr=kr) for _, d in members]
    def stack_field(f):
        vals = [getattr(d, f) for d in datas]
        if any(v is None for v in vals):
            return None
        return np.stack([np.asarray(v) for v in vals])

    stacked = ComplexData(*[stack_field(f) for f in _FIELDS])
    return names, stacked


def build_train_source(args):
    """Assemble the training source from CLI args (reference
    ``construct_loader``, ``datasets/loader.py:30-122``):
    ``--dataset pdbbind|moad|pdbsidechain``, plus ``--combined_training``
    (pdbbind + moad) and ``--triple_training`` (+ pdbsidechain)."""
    sources = []

    def pdbbind():
        from diffdock_tpu.data.datasets import (
            ComplexDataset, DatasetConfig, pdbbind_specs,
        )

        specs = pdbbind_specs(
            args.data_dir, args.split_train,
            esm_embeddings_dir=args.esm_embeddings_dir,
        )
        if args.limit_complexes:
            specs = specs[: args.limit_complexes]
        ds = ComplexDataset(specs, DatasetConfig(cache_dir=args.cache_path))
        ds.preprocess(num_workers=args.num_workers)
        return PDBBindSource(ds)

    def moad():
        from diffdock_tpu.data.moad import MOADConfig, MOADDataset

        ds = MOADDataset(MOADConfig(
            moad_dir=args.moad_dir, cache_dir=args.cache_path,
            split="train", limit_complexes=args.limit_complexes,
            chain_cutoff=args.chain_cutoff,
            unroll_clusters=args.unroll_clusters,
        ))
        esm_table = None
        if args.esm_embeddings_dir:
            from diffdock_tpu.data.esm import LazyNpyTable

            esm_table = LazyNpyTable(args.esm_embeddings_dir)
        ds.preprocess(esm_table=esm_table)
        return EpochIteratorSource(ds)

    def pdbsidechain():
        from diffdock_tpu.data.pdb_sidechain import (
            PDBSidechainConfig, PDBSidechainDataset,
        )

        ds = PDBSidechainDataset(PDBSidechainConfig(
            data_dir=args.pdbsidechain_dir, cache_dir=args.cache_path,
            limit_complexes=args.limit_complexes,
            remove_second_segment=args.remove_second_segment,
        ))
        ds.preprocess()
        return EpochIteratorSource(ds)

    if args.dataset == "pdbbind" or args.combined_training:
        sources.append(pdbbind())
    if args.dataset == "moad" or args.combined_training:
        sources.append(moad())
    if args.dataset == "pdbsidechain" or args.triple_training:
        sources.append(pdbsidechain())
    if not sources:
        raise ValueError(f"no training source for dataset={args.dataset}")
    return sources[0] if len(sources) == 1 else CombinedSource(sources)
