"""`vila-upload`: push a component checkpoint to the Hugging Face Hub.

Capability parity: llava/cli/upload2hf.py — upload the component-layout
checkpoint (llm/, vision_tower/, mm_projector/ + top-level config) so HF
consumers can load it; the reference additionally ships `remote_code`
(llava/remote_code/) for trust_remote_code loading, which our component
layout doesn't need (each component is a standard HF model directory).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser("vila-upload")
    p.add_argument("checkpoint", help="component checkpoint directory")
    p.add_argument("repo_id", help="target HF repo, e.g. org/model")
    p.add_argument("--private", action="store_true")
    p.add_argument("--branch", default="main")
    p.add_argument("--token", default=None)
    args = p.parse_args(argv)

    try:
        from huggingface_hub import HfApi
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed in this environment; "
            "install it to upload checkpoints."
        )

    for sub in ("llm", "vision_tower", "mm_projector"):
        path = os.path.join(args.checkpoint, sub)
        if not os.path.isdir(path):
            raise SystemExit(
                f"{args.checkpoint} is not a component checkpoint "
                f"(missing {sub}/)"
            )

    api = HfApi(token=args.token)
    api.create_repo(
        args.repo_id, private=args.private, exist_ok=True, repo_type="model"
    )
    api.upload_folder(
        folder_path=args.checkpoint,
        repo_id=args.repo_id,
        revision=args.branch,
        commit_message="upload vila_tpu checkpoint",
    )
    print(f"uploaded {args.checkpoint} -> {args.repo_id}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
