"""Port of the reference URL-identity hash.

Reference: ``src/tools/Hasher.java:27-38`` — SHA-1 of the UTF-8 bytes,
rendered 2 chars per digest byte through a custom 256-entry alphabet.
The row key / URL-seen identity of the whole system.

The byte→index step reproduces the reference's *signed-byte* arithmetic
(``(digest[i]>0) ? digest[i] : 255+digest[i]``): an unsigned byte value
``u`` maps to index ``u`` for 1..127, ``255`` for 0, and ``u-1`` for
128..255 (so indexes 128..254 and the 0-byte sharing index 255 with byte
255 — a quirk we must keep for key parity).
"""
from __future__ import annotations

import hashlib

_BYTE2CHARS = [
    "aa","ba","ca","da","ea","fa","ga","ha","ia","ja","ka","la","ma","na","oa","pa",
    "qa","ra","sa","ta","ua","va","wa","xa","ya","za","ac","bc","cc","dc","ec","fc",
    "gc","hc","ic","jc","kc","lc","mc","nc","oc","pc","qc","rc","sc","tc","uc","vc",
    "wc","xc","yc","zc","ae","be","ce","de","ee","fe","ge","he","ie","je","ke","le",
    "me","ne","oe","pe","qe","re","se","te","ue","ve","we","xe","ye","ze","ag","bg",
    "cg","dg","eg","fg","gg","hg","ig","jg","kg","lg","mg","ng","og","pg","qg","rg",
    "sg","tg","ug","vg","wg","xg","yg","zg","ai","bi","ci","di","ei","fi","gi","hi",
    "ii","ji","ki","li","mi","ni","oi","pi","qi","ri","si","ti","ui","vi","wi","xi",
    "yi","zi","ak","bk","ck","dk","ek","fk","gk","hk","ik","jk","kk","lk","mk","nk",
    "ok","pk","qk","rk","sk","tk","uk","vk","wk","xk","yk","zk","am","bm","cm","dm",
    "em","fm","gm","hm","im","jm","km","lm","mm","nm","om","pm","qm","rm","sm","tm",
    "um","vm","wm","xm","ym","zm","ao","bo","co","do","eo","fo","go","ho","io","jo",
    "ko","lo","mo","no","oo","po","qo","ro","so","to","uo","vo","wo","xo","yo","zo",
    "aq","bq","cq","dq","eq","fq","gq","hq","iq","jq","kq","lq","mq","nq","oq","pq",
    "qq","rq","sq","tq","uq","vq","wq","xq","yq","zq","as","bs","cs","ds","es","fs",
    "gs","hs","is","js","ks","ls","ms","ns","os","ps","qs","rs","ss","ts","us","vs",
]

# Precomputed signed-byte translation: unsigned byte value -> 2-char token.
_U2TOKEN = [""] * 256
for _u in range(256):
    if 1 <= _u <= 127:
        _idx = _u
    elif _u == 0:
        _idx = 255
    else:  # 128..255 -> signed negative -> 255 + (u - 256) = u - 1
        _idx = _u - 1
    _U2TOKEN[_u] = _BYTE2CHARS[_idx]

# hex pair -> token, for recoding a hex SHA-1 (e.g. from Spark's F.sha1)
HEXPAIR2TOKEN = {f"{u:02x}": _U2TOKEN[u] for u in range(256)}


def ref_hash(x: str) -> str:
    """40-char reference hash of a string (URL-seen identity)."""
    digest = hashlib.sha1(x.encode("utf-8")).digest()
    return "".join(_U2TOKEN[u] for u in digest)


def ref_hash_from_hex(sha1_hex: str) -> str:
    """Recode a 40-hex-char SHA-1 into the reference alphabet."""
    return "".join(
        HEXPAIR2TOKEN[sha1_hex[i : i + 2]] for i in range(0, 40, 2)
    )
