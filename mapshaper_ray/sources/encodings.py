"""Text-encoding support for the DBF/delim readers — the Python-codecs
counterpart of the reference's iconv-lite layer
(src/text/mapshaper-encodings.js:1-130) and its sample-based detection
(src/text/mapshaper-encoding-detection.js).

Detection order mirrors the reference: a sample set decodes cleanly as
UTF-8 → 'utf8'; else a win1252 character-frequency score test →
'win1252'; else the caller falls back to latin1.  The DBF language
driver id (LDID, header byte 29) short-circuits detection when present.
"""

from __future__ import annotations

import codecs

# common alias cleanup (reference standardizeEncodingName lowercases and
# strips dashes/underscores)
_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "latin1": "latin-1", "latin-1": "latin-1", "iso88591": "latin-1",
    "win1252": "cp1252", "windows1252": "cp1252", "cp1252": "cp1252",
    "win1251": "cp1251", "cp1251": "cp1251",
    "gbk": "gbk", "gb2312": "gb2312", "big5": "big5",
    "shiftjis": "shift_jis", "sjis": "shift_jis",
    "ascii": "ascii",
}

# dBase language driver id → codec (public LDID table subset)
LDID_CODECS = {
    0x01: "cp437", 0x02: "cp850", 0x03: "cp1252", 0x57: "cp1252",
    0x58: "cp1252", 0x59: "cp1252", 0x64: "cp852", 0x65: "cp866",
    0x66: "cp865", 0x67: "cp861", 0x6A: "cp737", 0x6B: "cp857",
    0x78: "cp950", 0x79: "cp949", 0x7A: "gbk", 0x7B: "cp932",
    0x7C: "cp874", 0x7D: "cp1255", 0x7E: "cp1256", 0xC8: "cp1250",
    0xC9: "cp1251", 0xCA: "cp1254", 0xCB: "cp1253",
}


def standardize_encoding(name: str) -> str:
    """Normalize an encoding name to a Python codec (raises on codecs
    Python doesn't know, like the reference's validation)."""
    key = name.lower().replace("-", "").replace("_", "").replace(" ", "")
    codec = _ALIASES.get(key, name)
    codecs.lookup(codec)  # raises LookupError if unsupported
    return codec


def decode_string(buf: bytes, encoding: str = "utf-8") -> str:
    """Lossy decode (replacement char on bad bytes, like iconv-lite)."""
    return buf.decode(standardize_encoding(encoding), errors="replace")


_ASCII = set("abcdefghijklmnopqrstuvwxyz0123456789.'\"?+-\n,:;/|_$% ")
_EXTENDED = set("ßàáâãäåæçèéêëìíîïðñòóôõöøùúûüýÿ°–±’‘")


def _char_score(s: str, chars: set) -> float:
    if not s:
        return 0.0
    s = s.lower()
    return sum(1 for ch in s if ch in chars) / len(s)


def looks_like_utf8(samples: list[bytes]) -> bool:
    """Clean UTF-8 decode (no replacement chars) — reference
    looksLikeUtf8."""
    joined = b"\n".join(samples)
    try:
        return "�" not in joined.decode("utf-8")
    except UnicodeDecodeError:
        return False


def looks_like_win1252(samples: list[bytes]) -> bool:
    """Reference looksLikeWin1252: mostly common ascii + a few common
    extended glyphs after a cp1252 decode."""
    s = "\n".join(b.decode("cp1252", errors="replace").strip()
                  for b in samples)
    ascii_score = _char_score(s, _ASCII)
    total_score = _char_score(s, _EXTENDED | _ASCII)
    return total_score > 0.97 and ascii_score > 0.7


def detect_encoding(samples: list[bytes]) -> str | None:
    """Sample-based detection (reference detectEncoding): utf8 →
    win1252 → None (caller falls back to latin1)."""
    if not samples:
        return None
    if looks_like_utf8(samples):
        return "utf-8"
    if looks_like_win1252(samples):
        return "cp1252"
    return None
