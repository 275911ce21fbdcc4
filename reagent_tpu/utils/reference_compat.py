"""Import helper for the reference implementation (golden-parity tests, bench
baselines).

The reference (facebookresearch/ReAgent at /root/reference) imports torch and,
transitively, torchrec; torch is installed but torchrec is not.  A minimal
module stub satisfies ``reagent.core.types``'s imports so the pure-torch parts
(models, estimators) are usable as oracles/baselines.
"""

from __future__ import annotations

import enum
import os
import sys
import types as pytypes

REFERENCE_PATH = "/root/reference"


def stub_torchrec() -> None:
    if "torchrec" in sys.modules:
        return

    class _Any:
        def __init__(self, *a, **k):
            pass

    class PoolingType(enum.Enum):
        MEAN = "MEAN"
        SUM = "SUM"

    torchrec = pytypes.ModuleType("torchrec")
    for name in (
        "KeyedJaggedTensor", "JaggedTensor", "KeyedTensor",
        "EmbeddingBagConfig", "EmbeddingBagCollection",
        "EmbeddingConfig", "EmbeddingCollection",
    ):
        setattr(torchrec, name, _Any)
    torchrec.PoolingType = PoolingType
    sys.modules["torchrec"] = torchrec
    for m in (
        "torchrec.sparse", "torchrec.sparse.jagged_tensor",
        "torchrec.modules", "torchrec.modules.embedding_configs",
        "torchrec.models", "torchrec.models.dlrm",
    ):
        sys.modules[m] = pytypes.ModuleType(m)
    sys.modules["torchrec.sparse.jagged_tensor"].KeyedJaggedTensor = _Any
    sys.modules["torchrec.sparse.jagged_tensor"].JaggedTensor = _Any
    sys.modules["torchrec.sparse.jagged_tensor"].KeyedTensor = _Any
    sys.modules["torchrec.modules.embedding_configs"].PoolingType = PoolingType
    sys.modules["torchrec.models.dlrm"].SparseArch = _Any


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def add_reference_to_path() -> bool:
    """Make ``import reagent`` resolve to the reference tree.  False if absent."""
    if not reference_available():
        return False
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)
    stub_torchrec()
    return True
