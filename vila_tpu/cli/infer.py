"""`vila-infer` CLI.

Capability parity: llava/cli/infer.py:100-176 — media type sniffing by
extension, conversation mode override, generation config flags, JSON-schema
structured output, and time-token decoding to timestamps (`decode_time_token`,
llava/cli/infer.py:31).
"""

from __future__ import annotations

import argparse
import json
import os
import re


def decode_time_token(
    text: str,
    *,
    duration: float,
    num_time_tokens: int,
    time_token_format: str = "<t{t}>",
) -> str:
    """Replace trained time tokens with `<seconds>` timestamps."""
    for t in range(num_time_tokens):
        token = time_token_format.format(t=t)
        ts = round(t * duration / max(num_time_tokens - 1, 1), 2)
        text = text.replace(token, f"<{ts}>")
    # out-of-range time tokens clamp to the end of the video
    for match in re.findall(r"<t(\d+)>", text):
        if int(match) >= num_time_tokens:
            text = text.replace(f"<t{match}>", f"<{round(duration, 2)}>")
    return text

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
    parser.add_argument("--json-mode", action="store_true",
                        help="constrain output to valid JSON")
    parser.add_argument("--json-schema", default=None,
                        help="path to a JSON-schema file for structured output")
    parser.add_argument("--video-duration", type=float, default=0.0,
                        help="decode <tN> time tokens against this duration")
    parser.add_argument("--num-time-tokens", type=int, default=100)
    parser.add_argument("--vision-int8", action="store_true",
                        help="deploy the vision tower W8A8 (TinyChat's "
                        "vision recipe; int8 MXU dots)")
    args = parser.parse_args()

    import vila_tpu
    from vila_tpu import conversation as conv_lib
    from vila_tpu.inference.generate import GenerationConfig

    engine = vila_tpu.load(args.model_path, vision_int8=args.vision_int8)
    if args.conv_mode:
        conv_lib.default_conversation = conv_lib.conv_templates[args.conv_mode]

    prompt = [sniff_media(p) for p in args.media]
    if args.text:
        prompt.append(args.text)

    response_format = None
    if args.json_schema:
        with open(args.json_schema) as f:
            response_format = {"type": "json_schema", "json_schema": json.load(f)}
    elif args.json_mode:
        response_format = {"type": "json_object"}

    gc = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        do_sample=args.temperature > 0,
        temperature=max(args.temperature, 1e-4),
        top_p=args.top_p,
        response_format=response_format,
    )
    if args.stream and response_format is None:
        for delta in engine.generate_content_stream(prompt, gc):
            print(delta, end="", flush=True)
        print()
    else:
        out = engine.generate_content(prompt, gc)
        if args.video_duration > 0:
            out = decode_time_token(
                out,
                duration=args.video_duration,
                num_time_tokens=args.num_time_tokens,
            )
        print(out)


if __name__ == "__main__":
    main()
