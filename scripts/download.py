"""Download model weights from the HuggingFace hub
(reference: scripts/download.py — hub snapshots; the gist downloads existed only
for the reference's parity tests).

No-network environments: point the finetune/generate CLIs at local checkpoints
instead; scripts/make_tiny_checkpoint.py creates a self-contained test model.
"""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def download_from_hub(
    repo_id: Optional[str] = None, local_dir: Path = Path("checkpoints/hf-llama/7B")
) -> None:
    """Download a model snapshot from the HuggingFace hub.

    Args:
        repo_id: Hub repo, e.g. openlm-research/open_llama_7b.
        local_dir: Destination directory.
    """
    if repo_id is None:
        raise ValueError("Please pass --repo_id, e.g. openlm-research/open_llama_7b")
    from huggingface_hub import snapshot_download

    snapshot_download(
        repo_id,
        local_dir=local_dir,
        local_dir_use_symlinks=False,
        allow_patterns=["*.bin", "*.json", "*.model"],
    )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(download_from_hub)
