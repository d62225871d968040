"""Pair explanation: the "why did (or didn't) these two documents
match" debugging surface — every tier's similarity metric for ONE
candidate pair, computed with the SAME kernels the pipeline stages use
(so the explanation is faithful to production behavior, not a
re-implementation).

This is a driver-side utility by design (one pair, not a stage): the
operational analogue of inspecting a single record in a debugger.  For
corpus-scale attribution use ``pipeline.tier_report``.
"""

from __future__ import annotations

from .config import DedupConfig


def explain_pair(text_a: str | None, text_b: str | None,
                 cfg: DedupConfig | None = None) -> dict:
    """Per-tier metrics for one text pair under ``cfg``'s knobs:

      exact_match           sha-equal content digests (pipeline M9/T1)
      normalized_match      equal after the C4-style normalization
      jaccard_e6            EXACT shingle Jaccard (ground truth)
      minhash_agree_e6      signature agreement (the LSH verify metric)
      band_collision        >= 1 shared LSH band key (would the band
                            shuffle surface this pair as a candidate?)
      simhash_hamming       fingerprint Hamming distance (D3 SimHash)
      longest_common_run    longest shared character run (substring
                            tier's quarry), via difflib's C matcher
      would_match           {tier: bool} under cfg's thresholds
    """
    import difflib
    import hashlib

    import numpy as np

    from .minhash import cached_signer as mh_signer
    from .minhash import jaccard, signature_agreement
    from .pipeline import _band_const
    from .simhash import cached_signer as sh_signer
    from .simhash import hamming64
    from .dist import mix64

    cfg = cfg or DedupConfig()
    a = text_a or ""
    b = text_b or ""
    out: dict = {}
    out["exact_match"] = bool(
        a == b and hashlib.sha256(a.encode()).digest()
        == hashlib.sha256(b.encode()).digest())
    norm_a = " ".join(a.lower().split())
    norm_b = " ".join(b.lower().split())
    out["normalized_match"] = norm_a == norm_b

    out["jaccard_e6"] = int(jaccard(a, b, k=cfg.shingle_k) * 1e6)

    signer = mh_signer(cfg.num_perm, cfg.shingle_k, cfg.seed)
    sig_a, sig_b = signer.sign_text(a), signer.sign_text(b)
    if sig_a is None or sig_b is None:
        out["minhash_agree_e6"] = None
        out["band_collision"] = False
    else:
        out["minhash_agree_e6"] = int(
            signature_agreement(sig_a, sig_b) * 1e6)
        va = np.frombuffer(sig_a, dtype="<u8")
        vb = np.frombuffer(sig_b, dtype="<u8")
        r = cfg.lsh_rows
        collide = False
        with np.errstate(over="ignore"):
            for i in range(cfg.lsh_bands):
                ha = np.uint64(_band_const(i))
                hb = np.uint64(_band_const(i))
                for j in range(r):
                    ha = mix64(np.array([ha ^ va[i * r + j]]))[0]
                    hb = mix64(np.array([hb ^ vb[i * r + j]]))[0]
                if ha == hb:
                    collide = True
                    break
        out["band_collision"] = bool(collide)

    ssign = sh_signer(cfg.seed)
    fa, fb = ssign.fingerprint(a), ssign.fingerprint(b)
    out["simhash_hamming"] = (hamming64(fa, fb)
                              if fa is not None and fb is not None
                              else None)

    m = difflib.SequenceMatcher(None, a, b, autojunk=False) \
        .find_longest_match(0, len(a), 0, len(b))
    out["longest_common_run"] = int(m.size)

    thr_e6 = int(cfg.verify_threshold * 1e6)
    out["would_match"] = {
        "exact": out["exact_match"],
        "minhash": bool(out["band_collision"]
                        and (out["minhash_agree_e6"] or 0) >= thr_e6),
        "simhash": (out["simhash_hamming"] is not None
                    and out["simhash_hamming"] <= cfg.simhash_hamming),
        "substring": out["longest_common_run"] >= cfg.min_substring,
    }
    return out
