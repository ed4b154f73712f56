"""`vila-infer` CLI.

Capability parity: llava/cli/infer.py:100-176 — media type sniffing by
extension, conversation mode override, generation config flags.
"""

from __future__ import annotations

import argparse
import os

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".gif")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def sniff_media(path: str):
    from vila_tpu.media import Image, Video

    ext = os.path.splitext(path)[1].lower()
    if ext in IMAGE_EXTS:
        return Image(path)
    if ext in VIDEO_EXTS or os.path.isdir(path):
        return Video(path)
    raise ValueError(f"cannot infer media type of '{path}'")


def main():
    parser = argparse.ArgumentParser("vila-infer")
    parser.add_argument("--model-path", "-m", required=True)
    parser.add_argument("--conv-mode", "-c", default=None)
    parser.add_argument("--text", "-t", default=None)
    parser.add_argument("--media", "-i", nargs="+", default=[])
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top-p", type=float, default=1.0)
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    import vila_tpu
    from vila_tpu import conversation as conv_lib
    from vila_tpu.inference.generate import GenerationConfig

    engine = vila_tpu.load(args.model_path)
    if args.conv_mode:
        conv_lib.default_conversation = conv_lib.conv_templates[args.conv_mode]

    prompt = [sniff_media(p) for p in args.media]
    if args.text:
        prompt.append(args.text)

    gc = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        do_sample=args.temperature > 0,
        temperature=max(args.temperature, 1e-4),
        top_p=args.top_p,
    )
    if args.stream:
        for delta in engine.generate_content_stream(prompt, gc):
            print(delta, end="", flush=True)
        print()
    else:
        print(engine.generate_content(prompt, gc))


if __name__ == "__main__":
    main()
