"""`vila-upload`: push a checkpoint to the Hugging Face Hub.

Capability parity: llava/cli/upload2hf.py — upload the component-layout
checkpoint (llm/, vision_tower/, mm_projector/ + top-level config), or,
with --remote-code, first convert it into the single-repo
`trust_remote_code` artifact (llava/remote_code/modeling_vila.py:229
conversion parity; see vila_tpu/export/hf_remote.py) and upload that.
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
    p.add_argument(
        "--remote-code", action="store_true",
        help="convert to a single-repo trust_remote_code artifact first",
    )
    args = p.parse_args(argv)

    if args.remote_code:
        import tempfile

        from vila_tpu import entry
        from vila_tpu.export import export_hf_repo

        cfg = entry.build_config(args.checkpoint, dtype="float32")
        params = entry.load_params(args.checkpoint, cfg)
        tokenizer = entry.load_tokenizer(args.checkpoint)
        out = tempfile.mkdtemp(prefix="vila_hf_export_")
        export_hf_repo(params, cfg, tokenizer, out)
        print(f"converted to remote-code artifact at {out}")
        args.checkpoint = out

    try:
        from huggingface_hub import HfApi
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed in this environment; "
            "install it to upload checkpoints."
        )

    if not args.remote_code:
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
