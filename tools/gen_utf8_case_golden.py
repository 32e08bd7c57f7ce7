#!/usr/bin/env python3
"""Regenerate the UTF8 case-normalization parity fixtures:

  src/main/resources/graft/utf8_case_map.tsv   (runtime resource)
  src/test/resources/graft/utf8_case_golden.tsv (golden vectors)

The map TSV is extracted mechanically from the reference's 893-entry
caseMap table (src/UTF8CaseNormalizationTransformation.cpp) — the
codepoint pairs the UTF8CaseNormalizationTransformation downcases with.
It deliberately diverges from Unicode toLowerCase: capital dotted I
(U+0130) maps to plain 'i' (not i + combining dot), capital sigma maps
to medial sigma ALWAYS (no final-sigma contextual form), and any
uppercase codepoint absent from the table (e.g. U+1E9E capital sharp s)
passes through UNCHANGED.

The golden TSV is produced by compiling the reference transformation
standalone (same approach as gen_arabic_golden.py) and running the FULL
normalization chain on each word — NormalizationTransformation's
period/apostrophe strip + in-place ASCII downcase, then the UTF8
transform (reference chain order, src/Repository.cpp:137-177).

    python3 tools/gen_utf8_case_golden.py

Deterministic input list, sorted output; rerunning must reproduce both
files byte-for-byte.
"""
import os
import re
import subprocess
import tempfile

REF = os.environ.get("GRAFT_REFERENCE", "/root/reference")
BASE = os.path.join(os.path.dirname(__file__), "..")
MAP_OUT = os.path.join(BASE, "src/main/resources/graft/utf8_case_map.tsv")
GOLD_OUT = os.path.join(BASE, "src/test/resources/graft/utf8_case_golden.tsv")

DRIVER = r"""
#include "indri/UTF8CaseNormalizationTransformation.hpp"
#include <iostream>
#include <string>
#include <cstring>
int main() {
  indri::parse::UTF8CaseNormalizationTransformation xform;
  std::string word;
  while (std::getline(std::cin, word)) {
    if (word.empty()) continue;
    // NormalizationTransformation stage (reference:
    // src/NormalizationTransformation.cpp:45-92): strip '.' and '\'',
    // ASCII in-place downcase (acronym list empty here)
    std::string t;
    for (char c : word) if (c != '.' && c != '\'') t.push_back(c);
    for (char &c : t) if (c >= 'A' && c <= 'Z') c += 'a' - 'A';
    if (t.empty()) { std::cout << word << "\t\n"; continue; }
    char* buf = new char[t.size() + 1];
    strcpy(buf, t.c_str());
    indri::api::ParsedDocument doc;
    doc.terms.push_back(buf);
    indri::api::ParsedDocument* out = xform.transform(&doc);
    std::cout << word << "\t" << out->terms[0] << "\n";
    delete[] buf;
  }
  return 0;
}
"""


def case_pairs():
    src = open(os.path.join(REF, "src",
                            "UTF8CaseNormalizationTransformation.cpp")).read()
    m = re.search(r"caseMap\[\]\s*=\s*\{(.*?)\};", src, re.S)
    pairs = re.findall(r"\{\s*0x([0-9A-Fa-f]+)\s*,\s*0x([0-9A-Fa-f]+)\s*\}",
                       m.group(1))
    return [(int(a, 16), int(b, 16)) for a, b in pairs]


def words(pairs):
    out = set()
    # every mapped upper, standalone and embedded between ASCII anchors
    # (exercises the re-encode path with surrounding bytes)
    for up, _ in pairs:
        c = chr(up)
        out.add(c)
        out.add("ab" + c + "yz")
    # chain-order and divergence probes
    out.update([
        "Straße", "STRASSE", "İstanbul", "ISTANBUL", "DİYARBAKIR",
        "IĞDIR", "ırmak", "ΣΊΣΥΦΟΣ", "ΣΙΣΥΦΟΣ", "ΟΔΥΣΣΕΥΣ",
        "Ὀδυσσεύς", "МОСКВА", "Москва", "ПРИВЕТ", "ՀԱՅԵՐԵՆ",
        "ქართული", "ᲚᲐᲠᲘ", "ＦＵＬＬＷＩＤＴＨ", "Ｈｅｌｌｏ",
        "ẞ", "ẞMIX", "ǄEVOJKA", "ǅevojka", "Ǆ", "ǅ", "ǆ",
        "ﬁre", "ﬆop",                       # ligatures: unmapped, pass through
        "µmeter", "ºno", "½half",           # unmapped signs
        "CAFÉ", "café", "ÉLÈVE", "NAÏVE", "SEÑOR", "ÆSIR", "Øre",
        "U.S.A", "can't", "O'NEILL", "Ph.D", "a.b.c'd",
        "»quoted«", "—dash—", "…", "...",
        "mixedΑΣCII", "ΑSCIIΣ", "tailΣ", "Σhead",
        "𐐀", "𐐧", "𐐀ab", "x𐐧y",           # Deseret (above the BMP)
        "İ", "I", "ı", "i", "İİİ", "III",
    ])
    return sorted(out)


def main():
    pairs = case_pairs()
    os.makedirs(os.path.dirname(MAP_OUT), exist_ok=True)
    with open(MAP_OUT, "w") as f:
        for up, lo in pairs:  # table order preserved (insert order)
            f.write(f"{up:04X}\t{lo:04X}\n")
    print(f"wrote {MAP_OUT}: {len(pairs)} pairs")

    tmp = tempfile.mkdtemp(prefix="utf8case-")
    drv = os.path.join(tmp, "driver.cpp")
    exe = os.path.join(tmp, "utf8case")
    with open(drv, "w") as f:
        f.write(DRIVER)
    subprocess.check_call([
        "g++", "-std=c++11", "-O1", "-w",
        f"-I{REF}/include", f"-I{REF}/contrib/lemur/include",
        drv,
        f"{REF}/src/UTF8CaseNormalizationTransformation.cpp",
        f"{REF}/src/UTF8Transcoder.cpp",
        f"{REF}/src/uint64comp.cpp",
        "-o", exe])
    inp = "\n".join(words(pairs)) + "\n"
    res = subprocess.run([exe], input=inp.encode("utf-8"),
                         stdout=subprocess.PIPE, check=True)
    os.makedirs(os.path.dirname(GOLD_OUT), exist_ok=True)
    with open(GOLD_OUT, "wb") as f:
        f.write(res.stdout)
    print(f"wrote {GOLD_OUT}: {res.stdout.decode('utf-8').count(chr(10))} vectors")


if __name__ == "__main__":
    main()
