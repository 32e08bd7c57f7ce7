#!/usr/bin/env python3
"""Regenerate src/test/resources/graft/arabic_light10_golden.tsv.

Builds a standalone driver around the reference Arabic light10 stemmer
(Arabic_Stemmer_utf8, stem function "arabic_light10") and runs it over a
seeded synthetic word list covering alef/ta-marbuta/alef-maqsura
normalization, diacritic and tatweel drops, waw/article prefixes, single
and doubled suffixes, length-guard shorties and mixed ASCII/Arabic
tokens. Requires the reference checkout (REF below) and g++.

    python3 tools/gen_arabic_golden.py

The committed TSV is the test fixture consumed by ArabicGoldenSpec and
the q_arabic driver oracle; rerunning this script must reproduce it
byte-for-byte (fixed seed, sorted output).
"""
import os
import random
import subprocess
import tempfile

REF = os.environ.get("GRAFT_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/arabic_light10_golden.tsv")

DRIVER = r"""
#include "indri/Arabic_Stemmer_utf8.hpp"
#include <iostream>
#include <string>
int main(int argc, char** argv) {
  std::string func = argc > 1 ? argv[1] : "arabic_light10";
  indri::parse::Arabic_Stemmer_utf8 stemmer(func);
  std::string word;
  char out[1024];
  while (std::getline(std::cin, word)) {
    if (word.empty()) continue;
    stemmer.stemTerm((char*)word.c_str(), out);
    std::cout << word << "\t" << out << "\n";
  }
  return 0;
}
"""


def words():
    random.seed(420)
    letters = [chr(c) for c in range(0x0621, 0x064B)]
    diacritics = [chr(c) for c in range(0x064B, 0x0653)]
    extra = [chr(c) for c in (0x067E, 0x0686, 0x06AF, 0x06A9, 0x0698,
                              0x0649, 0x0640)]
    articles = ["ال", "وال", "بال",
                "كال", "فال", "لل"]
    suffixes = ["ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي"]
    waw = "و"
    out = set()

    def core(nmin, nmax):
        return "".join(random.choice(letters + extra)
                       for _ in range(random.randint(nmin, nmax)))

    while len(out) < 20000:
        r = random.random()
        w = core(1, 6)
        if r < 0.25:
            w = random.choice(articles) + w
        if 0.2 < r < 0.5:
            w = waw + w
        if r > 0.35:
            w = w + random.choice(suffixes)
        if random.random() < 0.3:
            pos = random.randint(0, len(w))
            w = w[:pos] + random.choice(diacritics) + w[pos:]
        if random.random() < 0.1:
            w = w + random.choice(suffixes)
        if random.random() < 0.05:
            w = core(1, 2)
        out.add(w)
    for i in range(500):
        out.add("abc" + core(1, 3))
        out.add(core(1, 3) + str(i))
    return sorted(out)


def main():
    tmp = tempfile.mkdtemp(prefix="arstem-")
    drv = os.path.join(tmp, "driver.cpp")
    exe = os.path.join(tmp, "arstem")
    with open(drv, "w") as f:
        f.write(DRIVER)
    subprocess.check_call([
        "g++", "-std=c++11", "-O1", "-w",
        f"-I{REF}/include", f"-I{REF}/contrib/lemur/include",
        drv,
        f"{REF}/src/Arabic_Stemmer_utf8.cpp",
        f"{REF}/src/UTF8Transcoder.cpp",
        f"{REF}/src/uint64comp.cpp",
        "-o", exe])
    inp = "\n".join(words()) + "\n"
    res = subprocess.run([exe, "arabic_light10"], input=inp.encode("utf-8"),
                         stdout=subprocess.PIPE, check=True)
    with open(OUT, "wb") as f:
        f.write(res.stdout)
    print(f"wrote {OUT}: {res.stdout.decode('utf-8').count(chr(10))} vectors")


if __name__ == "__main__":
    main()
