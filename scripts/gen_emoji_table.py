#!/usr/bin/env python3
"""Generate src/main/resources/graft/emoji_names.tsv (emoji<TAB>name).

Source: the public emoji shortcode table vendored by pip inside `rich`
(_emoji_codes.py, MIT) — itself generated from the Unicode CLDR short
names, the same data the `emoji` package's demojize(language="en") uses.
This keeps the build offline-friendly: no network fetch, just a public
table already present in the container, checked into the repo as a
resource.

Collisions (several names for one emoji): the table mixes CLDR short
names ("thumbs_up", "red_heart") with GitHub-style aliases ("+1",
"thumbsup", "heart"). demojize parity wants the CLDR name, which in
practice is the underscored form — so prefer names containing '_', then
the lexicographically smallest, which keeps the choice deterministic.
"""
import glob
import importlib.util
import os

CANDIDATES = sorted(
    glob.glob("/root/.pyenv/versions/*/lib/python*/site-packages/pip/_vendor/rich/_emoji_codes.py")
)

def load_table(path):
    spec = importlib.util.spec_from_file_location("ec", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.EMOJI

def main():
    table = load_table(CANDIDATES[-1])
    by_char = {}
    for name, char in table.items():
        by_char.setdefault(char, []).append(name)
    inv = {}
    for char, names in by_char.items():
        underscored = [n for n in names if "_" in n]
        inv[char] = min(underscored) if underscored else min(names)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "main", "resources", "graft", "emoji_names.tsv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        for char in sorted(inv):
            name = inv[char]
            assert "\t" not in char and "\t" not in name
            f.write(f"{char}\t{name}\n")
    print(f"wrote {out}: {len(inv)} emoji ({len(table)} names)")

if __name__ == "__main__":
    main()
