"""ESM2 protein-language-model embedding tooling.

The reference prepares per-residue ESM2-650M embeddings in three ways:

* ``datasets/esm_embedding_preparation.py`` — extract one FASTA record per
  chain (``{name}_chain_{i}``) from each PDB file,
* the ``esm extract`` CLI (repr layer 33) producing one ``.pt`` per record,
  then ``datasets/esm_embeddings_to_pt.py`` re-keying them into a single
  dict ``{complex: [chain tensors]}``,
* a live in-process model for user inference
  (``utils/inference_utils.py:55-85``, ``compute_ESM_embeddings``).

TPU-native equivalents, all host-side data plane:

* :func:`chain_sequences` / :func:`write_fasta` — FASTA prep from our pure-
  Python PDB parser (no BioPython),
* :func:`convert_esm_extract_dir` — fold ``esm extract`` ``.pt`` outputs into
  per-complex ``.npy`` files consumable by
  :class:`diffdock_tpu.data.datasets.ComplexSpec.lm_embedding_path`,
* :class:`ESM2Embedder` — live embeddings through HuggingFace
  ``transformers`` (gated: requires locally cached weights; this image has
  no network egress).

Embeddings are joined per chain in file order and concatenated over the
residues that carry a C-alpha, matching the receptor featurizer's residue
order (``diffdock_tpu.data.featurize.build_receptor_arrays``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from diffdock_tpu.data.chem import ProteinStructure, read_pdb_file

ESM_LAYER = 33  # reference uses repr layer 33 of esm2_t33_650M_UR50D
ESM_DIM = 1280
DEFAULT_MODEL = "facebook/esm2_t33_650M_UR50D"


def chain_sequences(protein: ProteinStructure) -> List[Tuple[str, str]]:
    """(chain_id, sequence) per chain, CA-bearing residues only — the same
    residue set the featurizer keeps, so embedding rows align 1:1."""
    out = []
    for ch in protein.chains():
        seq = protein.sequence(chain=ch)
        if seq:
            out.append((ch, seq))
    return out


def write_fasta(records: Dict[str, str], path: str) -> None:
    """Write ``{label: sequence}`` as FASTA (reference
    ``esm_embedding_preparation.py`` output format: one record per chain
    labelled ``{name}_chain_{i}``)."""
    with open(path, "w") as f:
        for label, seq in records.items():
            f.write(f">{label}\n{seq}\n")


def fasta_records_for_pdbs(
    pdb_paths: Dict[str, str]
) -> Dict[str, str]:
    """``{complex_name: pdb_path}`` -> ``{f"{name}_chain_{i}": seq}``."""
    records: Dict[str, str] = {}
    for name, path in pdb_paths.items():
        protein = read_pdb_file(path)
        for i, (_, seq) in enumerate(chain_sequences(protein)):
            records[f"{name}_chain_{i}"] = seq
    return records


def _load_pt_representation(path: str) -> np.ndarray:
    """Read one ``esm extract`` output file (torch cpu is in the image)."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    rep = d["representations"][ESM_LAYER]
    return np.asarray(rep.float().numpy(), np.float32)


def convert_esm_extract_dir(
    extract_dir: str,
    out_dir: str,
    verbose: bool = True,
) -> Dict[str, str]:
    """Fold ``esm extract`` per-record ``.pt`` files into one ``.npy`` per
    complex (chains concatenated in index order) — the join the reference
    does in ``datasets/esm_embeddings_to_pt.py`` with dict-of-lists pickles.

    Returns ``{complex_name: npy_path}``.
    """
    by_complex: Dict[str, List[Tuple[int, str]]] = {}
    for fn in sorted(os.listdir(extract_dir)):
        if not fn.endswith(".pt"):
            continue
        label = fn[: -len(".pt")]
        if "_chain_" not in label:
            continue
        name, idx = label.rsplit("_chain_", 1)
        by_complex.setdefault(name, []).append(
            (int(idx), os.path.join(extract_dir, fn))
        )

    os.makedirs(out_dir, exist_ok=True)
    out: Dict[str, str] = {}
    for name, chains in by_complex.items():
        chains.sort()
        arrs = [_load_pt_representation(p) for _, p in chains]
        emb = np.concatenate(arrs, axis=0)
        path = os.path.join(out_dir, f"{name}.npy")
        np.save(path, emb)
        out[name] = path
        if verbose:
            print(f"[esm] {name}: {emb.shape[0]} residues -> {path}")
    return out


class LazyNpyTable:
    """Dict-like ``{name: (R, 1280) array}`` backed by per-name ``.npy``
    files (the output of :func:`convert_esm_extract_dir`); loads lazily so
    datasets with thousands of receptors don't hold every embedding in RAM."""

    def __init__(self, directory: str):
        self.directory = Path(directory)

    def __contains__(self, name: str) -> bool:
        return (self.directory / f"{name}.npy").exists()

    def get(self, name: str, default=None):
        path = self.directory / f"{name}.npy"
        if not path.exists():
            return default
        return np.load(path)

    def __getitem__(self, name: str) -> np.ndarray:
        out = self.get(name)
        if out is None:
            raise KeyError(name)
        return out


class ESM2Embedder:
    """Live ESM2 embeddings via HuggingFace ``transformers``.

    The reference loads fair-esm's ``esm2_t33_650M_UR50D`` in-process for
    user inference (``utils/inference_utils.py:55-85``). Here the same model
    through transformers; requires the weights in the local HF cache
    (``local_files_only`` — this image has no network egress, so absent
    weights raise a clear, actionable error instead of hanging on a
    download).
    """

    def __init__(self, model_name: str = DEFAULT_MODEL, device: str = "cpu"):
        try:
            from transformers import AutoTokenizer, EsmModel
        except Exception as e:  # pragma: no cover - transformers is baked in
            raise RuntimeError(f"transformers unavailable: {e}") from e
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                model_name, local_files_only=True
            )
            self.model = EsmModel.from_pretrained(
                model_name, local_files_only=True
            ).eval()
        except Exception as e:
            raise RuntimeError(
                f"ESM2 weights for {model_name} not in local HF cache; "
                "precompute embeddings offline (esm extract + "
                "convert_esm_extract_dir) or provide cached weights"
            ) from e
        self.device = device

    def embed(self, sequence: str) -> np.ndarray:
        """(len(sequence), 1280) per-residue embeddings from the last hidden
        layer (layer 33 of the 33-layer model), BOS/EOS stripped."""
        import torch

        toks = self.tokenizer(sequence, return_tensors="pt")
        with torch.no_grad():
            out = self.model(**toks).last_hidden_state[0]
        return np.asarray(out[1 : 1 + len(sequence)].float().numpy(), np.float32)

    def embed_protein(self, protein: ProteinStructure) -> np.ndarray:
        """Per-residue embeddings for all chains, concatenated in chain
        order — rows align with ``residues_with_ca()``."""
        parts = [self.embed(seq) for _, seq in chain_sequences(protein)]
        if not parts:
            return np.zeros((0, ESM_DIM), np.float32)
        return np.concatenate(parts, axis=0)


def make_embedder(device: str = "cpu"):
    """Best live-LM backend available: the TPU-native JAX ESM2 encoder when
    a converted checkpoint is present (``DIFFDOCK_TPU_ESM2_NPZ``, produced
    by ``cli/esm_prep.py convert-hf``), else the torch/transformers path
    (``ESM2Embedder``). Raises RuntimeError when neither has weights."""
    npz = os.environ.get("DIFFDOCK_TPU_ESM2_NPZ")
    if npz and os.path.exists(npz):
        from diffdock_tpu.models.esm2 import JaxESM2Embedder, load_params

        params, cfg = load_params(npz)
        return JaxESM2Embedder(params, cfg)
    return ESM2Embedder(device=device)


def compute_esm_embeddings_if_available(
    protein: ProteinStructure,
) -> Optional[np.ndarray]:
    """Live ESM2 embeddings when weights are available (converted-npz JAX
    path or local HF cache), else None (callers decide the fallback — e.g.
    zero embeddings with a warning in scripts/parity_eval.py)."""
    try:
        embedder = make_embedder()
    except RuntimeError:
        return None
    return embedder.embed_protein(protein)


def embeddings_for_protein(
    protein: ProteinStructure,
    table: Optional[Dict[str, np.ndarray]] = None,
    name: Optional[str] = None,
    embedder: Optional[ESM2Embedder] = None,
) -> Optional[np.ndarray]:
    """Resolve per-residue embeddings: precomputed table first, else a live
    embedder, else None (model then runs without LM features)."""
    if table is not None and name is not None and name in table:
        return np.asarray(table[name], np.float32)
    if embedder is not None:
        return embedder.embed_protein(protein)
    return None
