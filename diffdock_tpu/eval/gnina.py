"""gnina rescoring hook (reference ``utils/gnina_utils.py:13-89``):
write the pose, shell out to a gnina binary, parse CNNscore. Host-side,
gated on the binary being present."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional

from diffdock_tpu.data.chem import Molecule, write_sdf


def gnina_available(binary: str = "gnina") -> bool:
    return shutil.which(binary) is not None


def gnina_score(
    mol: Molecule,
    pose,
    receptor_pdb: str,
    binary: str = "gnina",
    minimize: bool = True,
    timeout_s: float = 120.0,
) -> Optional[float]:
    """Returns CNNscore, or None if gnina is unavailable/fails."""
    if not gnina_available(binary):
        return None
    with tempfile.TemporaryDirectory() as td:
        pose_sdf = os.path.join(td, "pose.sdf")
        with open(pose_sdf, "w") as f:
            f.write(write_sdf(mol, pose))
        cmd = [binary, "--receptor", receptor_pdb, "--ligand", pose_sdf,
               "--score_only" if not minimize else "--minimize"]
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout_s,
                check=True,
            ).stdout
        except (subprocess.SubprocessError, OSError):
            return None
        for line in out.splitlines():
            if line.strip().startswith("CNNscore"):
                try:
                    return float(line.split()[-1])
                except ValueError:
                    return None
    return None
