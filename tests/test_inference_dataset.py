"""Inference dataset: spec resolution, CSV parsing, gating, success flags."""

import numpy as np
import pytest

from diffdock_tpu.data.chem import HAVE_RDKIT
from diffdock_tpu.data.inference_dataset import (
    InferenceDatasetBuilder,
    InferenceSpec,
    read_ligand_description,
    specs_from_csv,
)

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


def test_build_from_files():
    b = InferenceDatasetBuilder()
    c = b.build(InferenceSpec("6w70", EXAMPLE_PDB, None, EXAMPLE_SDF))
    assert c.success, c.error
    assert c.data is not None and c.data.n_lig > 0
    assert c.mol.num_atoms == c.data.n_lig


def test_smiles_requires_rdkit_or_clear_error():
    if HAVE_RDKIT:
        mol = read_ligand_description("CCO")
        assert mol.num_atoms == 3
    else:
        with pytest.raises(RuntimeError, match="RDKit"):
            read_ligand_description("CCO")


def test_failure_is_flagged_not_fatal():
    b = InferenceDatasetBuilder()
    out = b.build_all(
        [
            InferenceSpec("good", EXAMPLE_PDB, None, EXAMPLE_SDF),
            InferenceSpec("bad", "/nonexistent.pdb", None, EXAMPLE_SDF),
        ],
        verbose=False,
    )
    assert [c.success for c in out] == [True, False]
    assert out[1].error


def test_specs_from_csv(tmp_path):
    csv_path = tmp_path / "jobs.csv"
    csv_path.write_text(
        "complex_name,protein_path,protein_sequence,ligand_description\n"
        f"a,{EXAMPLE_PDB},,{EXAMPLE_SDF}\n"
        f",{EXAMPLE_PDB},,CCO\n"
        "seqonly,,MKV,CCO\n"
    )
    specs = specs_from_csv(str(csv_path))
    assert specs[0].name == "a"
    assert specs[0].ligand_description == EXAMPLE_SDF
    assert specs[1].name == "complex_1"
    assert specs[2].protein_sequence == "MKV"
    assert specs[2].protein_path is None


def test_sequence_without_weights_raises_actionable_error(tmp_path):
    b = InferenceDatasetBuilder(workdir=str(tmp_path))
    c = b.build(InferenceSpec("seq", None, "MKVLLA", EXAMPLE_SDF))
    # ESMFold weights are not cached in this image -> flagged failure with
    # an actionable message (or success if someone baked the weights in)
    if not c.success:
        assert "ESMFold" in c.error or "transformers" in c.error


def _mock_fold(sequence: str, out_path: str) -> str:
    """Stand-in for ESMFold: write an ideal alpha-helix backbone PDB for
    the sequence (N/CA/C/O per residue). Geometry is plausible enough for
    featurization; no network or weights needed."""
    three = {
        "A": "ALA", "M": "MET", "K": "LYS", "V": "VAL", "L": "LEU",
        "G": "GLY", "S": "SER", "T": "THR", "E": "GLU", "D": "ASP",
    }
    lines = []
    serial = 1
    for i, aa in enumerate(sequence):
        theta = i * 100.0 * np.pi / 180.0
        ca = np.array(
            [2.3 * np.cos(theta), 2.3 * np.sin(theta), 1.5 * i]
        )
        offs = {
            "N": ca + [-0.5, 1.2, -0.6],
            "CA": ca,
            "C": ca + [1.2, 0.4, 0.5],
            "O": ca + [1.6, 1.4, 0.9],
        }
        res = three.get(aa, "ALA")
        for name, pos in offs.items():
            lines.append(
                f"ATOM  {serial:5d}  {name:<3s} {res} A{i + 1:4d}    "
                f"{pos[0]:8.3f}{pos[1]:8.3f}{pos[2]:8.3f}  1.00  0.00"
                f"          {name[0]:>2s}"
            )
            serial += 1
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


def test_sequence_input_with_mock_folder(tmp_path):
    """Sequence-only specs run the full fold->featurize wiring with an
    injected folder (reference generate_ESM_structure,
    utils/inference_utils.py:87-116)."""
    b = InferenceDatasetBuilder(workdir=str(tmp_path), folder=_mock_fold)
    seq = "MKVLLAGSTEDAMKVLLAGSTED"
    c = b.build(InferenceSpec("seq", None, seq, EXAMPLE_SDF))
    assert c.success, c.error
    assert c.data.n_rec == len(seq)
    assert (tmp_path / "seq_esmfold.pdb").exists()


def _tiny_esmfold():
    """A real EsmForProteinFolding with a tiny random config: exercises the
    genuine transformers ESMFold code path (internal tokenization, folding
    trunk, structure module, PDB writer) without the 3B-parameter weights."""
    from transformers import EsmForProteinFolding
    from transformers.models.esm.configuration_esm import (
        EsmConfig,
        EsmFoldConfig,
        StructureModuleConfig,
        TrunkConfig,
    )

    sm = StructureModuleConfig(
        sequence_dim=32, pairwise_dim=16, ipa_dim=8, resnet_dim=8,
        num_heads_ipa=2, num_blocks=1, num_resnet_blocks=1,
    )
    trunk = TrunkConfig(
        num_blocks=1, sequence_state_dim=32, pairwise_state_dim=16,
        sequence_head_width=16, pairwise_head_width=8, structure_module=sm,
    )
    cfg = EsmConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, vocab_size=33, is_folding_model=True,
        esmfold_config=EsmFoldConfig(trunk=trunk, fp16_esm=False),
        pad_token_id=1, mask_token_id=32,
        position_embedding_type="rotary",
    )
    import torch

    torch.manual_seed(0)
    return EsmForProteinFolding(cfg).eval()


def test_fold_sequence_oom_halves_chunk_size(tmp_path):
    """On OOM, fold_sequence degrades the axial-attention chunk size
    (256 -> 128 -> ...) and retries, mirroring the reference
    generate_ESM_structure (utils/inference_utils.py:87-115, ADVICE r3)."""
    from diffdock_tpu.data.inference_dataset import fold_sequence

    class Trunk:
        def __init__(self):
            self.chunks = []

        def set_chunk_size(self, c):
            self.chunks.append(c)

    class FakeModel:
        def __init__(self):
            self.trunk = Trunk()

        def infer_pdbs(self, seqs):
            # OOM until the chunk size is degraded twice
            if len(self.trunk.chunks) < 2:
                raise RuntimeError("CUDA out of memory. Tried to allocate")
            return ["ATOM      1  CA  ALA A   1       0.000   0.000   "
                    "0.000  1.00  0.00           C\n"]

    out = str(tmp_path / "seq.pdb")
    assert fold_sequence("MKV", out, model=FakeModel()) == out
    with open(out) as f:
        assert " CA " in f.read()
    # degradation sequence matches the reference's halving ladder
    assert FakeModel().trunk.chunks == []

    m = FakeModel()
    fold_sequence("MKV", str(tmp_path / "seq2.pdb"), model=m)
    assert m.trunk.chunks == [256, 128]

    class AlwaysOOM(FakeModel):
        def infer_pdbs(self, seqs):
            raise MemoryError()

    import pytest

    with pytest.raises(RuntimeError, match="chunk_size=1"):
        fold_sequence("MKV", str(tmp_path / "seq3.pdb"), model=AlwaysOOM())

    class RealError(FakeModel):
        def infer_pdbs(self, seqs):
            raise RuntimeError("shape mismatch")

    with pytest.raises(RuntimeError, match="shape mismatch"):
        fold_sequence("MKV", str(tmp_path / "seq4.pdb"), model=RealError())


def test_sequence_input_with_real_esmfold_code(tmp_path):
    """The REAL ESMFold code path (not the mock): tiny random-config
    EsmForProteinFolding -> make_esmfold_folder -> fold -> PDB parse ->
    featurize. Certifies that with weights present the sequence-input path
    is exactly this wiring (reference inference_utils.py:87-115)."""
    from diffdock_tpu.data.inference_dataset import make_esmfold_folder

    folder = make_esmfold_folder(_tiny_esmfold())
    b = InferenceDatasetBuilder(workdir=str(tmp_path), folder=folder)
    seq = "MKTAYIAKQRQISFVKSHFSRQ"
    c = b.build(InferenceSpec("seq", None, seq, EXAMPLE_SDF))
    assert c.success, c.error
    assert c.data.n_rec == len(seq)
    pdb = (tmp_path / "seq_esmfold.pdb").read_text()
    assert pdb.count(" CA ") == len(seq)
    assert np.isfinite(c.data.rec_pos).all()


@pytest.mark.slow
def test_sequence_to_dock_end_to_end(tmp_path):
    """spec -> (mock) fold -> featurize -> dock produces finite poses: the
    sequence-input path is exercised end to end."""
    import jax

    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.factory import build_model

    b = InferenceDatasetBuilder(workdir=str(tmp_path), folder=_mock_fold)
    c = b.build(InferenceSpec("seq", None, "MKVLLAGSTEDAMKVL", EXAMPLE_SDF))
    assert c.success, c.error

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128, mc_samples=2000))
    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                           num_prot_emb_layers=0)
    model = build_model(cfg)
    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, c.data),
        jnp.asarray(c.data.lig_pos), jnp.asarray(0.5), so3, torus,
    )
    pipe = DockingPipeline(
        cfg, params, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
    )
    res = pipe.dock_complex(c.data, num_poses=2, seed=0)
    assert res.poses.shape == (2, c.data.n_lig, 3)
    assert np.isfinite(res.poses).all()
