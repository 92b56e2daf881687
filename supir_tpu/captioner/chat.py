"""Terminal chat with the captioner (reference llava/serve/cli.py): load an
image, ask questions interactively."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    from supir_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser("captioner chat")
    ap.add_argument("--image", required=True)
    ap.add_argument("--temperature", type=float, default=0.2)
    ap.add_argument("--top_p", type=float, default=0.7)
    ap.add_argument("--query", default=None,
                    help="one-shot mode (reference llava/eval/run_llava.py): "
                         "answer this single question and exit")
    ap.add_argument("--tiny-random", action="store_true",
                    help="random tiny model (no weights; for smoke runs)")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args(argv)

    from PIL import Image

    from supir_tpu.captioner.agent import CaptionerAgent

    if args.tiny_random:
        agent = CaptionerAgent.create_random()
    else:
        agent = CaptionerAgent.create_default(args.weights)

    img = np.asarray(Image.open(args.image).convert("RGB"))
    if args.query is not None:
        print(agent.gen_image_caption(
            [img], temperature=args.temperature, top_p=args.top_p,
            qs=args.query,
        )[0])
        return
    print("image loaded; empty line to exit")
    while True:
        try:
            q = input("USER: ").strip()
        except EOFError:
            break
        if not q:
            break
        ans = agent.gen_image_caption(
            [img], temperature=args.temperature, top_p=args.top_p, qs=q
        )[0]
        print("ASSISTANT:", ans)


if __name__ == "__main__":
    main()
