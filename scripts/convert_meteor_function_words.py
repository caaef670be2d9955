"""Extract METEOR-1.5's English function-word list from a meteor jar.

The jar used by the reference's metric stack (pycocoevalcap bundles
meteor-1.5.jar; AttemptFour/metric_suit.py:88-109) carries its
corpus-frequency-derived function words at ``resources/function/en.words``
inside the jar (a zip). Neither the jar nor a corpus to regenerate the list
exists in this zero-egress image, so the framework bundles a documented
closed-class default (masters_thesis_tpu/evalsuite/
meteor_function_words_en.txt). Run this offline where the jar (or a
meteor-1.5 source checkout) is available, then point
``MTT_METEOR_FUNCTION_WORDS`` at the output for bit-exact membership:

  python convert_meteor_function_words.py /path/to/meteor-1.5.jar out.txt
  python convert_meteor_function_words.py /path/to/meteor-1.5/ out.txt
"""

from __future__ import annotations

import os
import sys
import zipfile

JAR_ENTRY = "resources/function/en.words"
SRC_PATH = os.path.join("resources", "function", "en.words")


def extract(src: str) -> list[str]:
    if os.path.isdir(src):
        path = os.path.join(src, SRC_PATH)
        with open(path, encoding="utf-8") as f:
            text = f.read()
    else:
        with zipfile.ZipFile(src) as z:
            names = [n for n in z.namelist() if n.endswith("function/en.words")]
            if not names:
                raise SystemExit(
                    f"{src}: no */function/en.words entry "
                    f"(looked for {JAR_ENTRY})")
            text = z.read(names[0]).decode("utf-8")
    words = [w.strip().lower() for w in text.splitlines()]
    return sorted({w for w in words if w and not w.startswith("#")})


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    src, out = sys.argv[1], sys.argv[2]
    words = extract(src)
    with open(out, "w", encoding="utf-8") as f:
        f.write(
            "# METEOR-1.5 function/en.words, extracted verbatim by\n"
            f"# scripts/convert_meteor_function_words.py from {os.path.basename(src)}\n"
        )
        for w in words:
            f.write(w + "\n")
    print(f"wrote {len(words)} function words -> {out}")


if __name__ == "__main__":
    main()
