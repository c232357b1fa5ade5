"""Pure-Python test oracle: a direct, sequential re-implementation of the
reference algorithms (processor/post_processor/processor_domain.py:18-91,
processor_twitter.py:18-108, processor.py:16-51), operating on the span
representation. Used ONLY by tests to validate the distributed plans in
citations.py — never in the engine hot path.

Own code, written from the behavioral survey (SURVEY.md §2.3-2.5); not a
copy of the reference sources.
"""

from __future__ import annotations

import re


def _handle_norm(h: str) -> str:
    return h.replace("@", "").strip().lower()


def _host(url: str) -> str:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", url)
    auth = m.group(1) if m else ""
    auth = re.sub(r"^[^@]*@", "", auth)
    auth = re.sub(r":\d+$", "", auth)
    return auth.lower()


_TWO_LEVEL = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "com.br", "co.in", "com.cn", "co.nz", "co.za", "com.mx",
}


def _tld_parts(url: str) -> tuple[str, str, str]:
    host = _host(url)
    labels = host.split(".") if host else []
    n = len(labels)
    slen = 2 if n >= 3 and ".".join(labels[-2:]) in _TWO_LEVEL else 1
    suf = ".".join(labels[-slen:]) if n >= slen else host
    dom = labels[-(slen + 1)] if n > slen else ""
    sub = ".".join(labels[: n - slen - 1]) if n - slen - 1 > 0 else ""
    return (sub, dom, suf)


def _doc_links(doc: dict) -> list[dict]:
    return [s for s in doc["spans"] if s["kind"] == "link"]


def _doc_mentions(doc: dict) -> list[str]:
    return [s["media_ref"] for s in doc["spans"] if s["kind"] == "mention"]


def _doc_match_text(doc: dict) -> str:
    if doc["doc_type"] == "article":
        parts = [s["text"] for s in doc["spans"] if s["kind"] in ("text", "link")]
    else:
        parts = [s["text"] for s in doc["spans"] if s["kind"] == "text"]
    return " ".join(parts)


def match_article(doc: dict, scope: list[dict]):
    cites, names, anchors, found = [], [], [], []
    text = _doc_match_text(doc)
    links = _doc_links(doc)
    for entry in scope:
        source = entry["source"]
        if "http" in source:
            if _tld_parts(doc["domain"]) == _tld_parts(source):
                continue  # self-citation: skip whole entry
            domain = _host(source)
            for ln in links:
                u = ln["media_ref"]
                ul = u.lower()
                if not re.match(r"^https?://", ul):
                    continue
                if (domain + "/") in ul and _host(u) in (domain, "www." + domain):
                    if u not in cites:
                        cites.append(u)
                        anchors.append(ln["text"])
                        names.append(entry["name"])
                    if source not in found:
                        found.append(source)
        for alias in entry.get("aliases") or []:
            pat = r"""( |"|')""" + re.escape(alias) + r"""( |"|'|,)"""
            if re.search(pat, text, re.IGNORECASE):
                cites.append(alias)
                names.append(entry["name"])
                if source not in found:
                    found.append(source)
        for handle in entry.get("twitter_handles") or []:
            if re.search("@" + re.escape(handle), text, re.IGNORECASE):
                cites.append(handle)
                names.append(entry["name"])
                if source not in found:
                    found.append(source)
    return cites, names, anchors, found


def match_tweet(doc: dict, scope: list[dict]):
    cites, names, found = [], [], []
    my_handle = _handle_norm(doc["domain"])
    links = [ln["media_ref"] for ln in _doc_links(doc)]
    mentions = _doc_mentions(doc)
    text = _doc_match_text(doc)
    for entry in scope:
        handles = entry.get("twitter_handles") or []
        if any(_handle_norm(h) == my_handle for h in handles):
            continue
        source = entry["source"]
        if "http" in source:
            domain = _host(source) + "/"
            for u in links:
                if domain in u.lower():
                    cites.append(u)
                    names.append(entry["name"])
                    if source not in found:
                        found.append(source)
        for u in links:
            for h in handles:
                tw = ("https://twitter.com/" + h.replace("@", "") + "/").lower()
                if tw in u.lower() and u not in cites:
                    cites.append(u)
                    names.append(entry["name"])
                    if source not in found:
                        found.append(source)
        for m in mentions:
            for h in handles:
                if _handle_norm(h) == _handle_norm(m):
                    cites.append(h)
                    names.append(entry["name"])
                    if source not in found:
                        found.append(source)
        for alias in entry.get("aliases") or []:
            pat = r"""( |"|')""" + re.escape(alias) + r"""( |"|'|,)"""
            if re.search(pat, text, re.IGNORECASE) and alias not in cites:
                cites.append(alias)
                names.append(entry["name"])
                if source not in found:
                    found.append(source)
    return cites, names, [], found


def run_oracle(docs: list[dict], crawl_scope: list[dict], citation_scope: list[dict]):
    """Full pipeline: per-doc citations, referral maps, probe, decoration.
    Returns {doc_id: row_dict}."""
    docs = sorted(docs, key=lambda d: d["seq"])
    results = {}
    dom_ref: dict[str, list[str]] = {}
    twi_ref: dict[str, list[str]] = {}
    for doc in docs:
        if doc["doc_type"] == "article":
            cites, names, anchors, found = match_article(doc, citation_scope)
        else:
            cites, names, anchors, found = match_tweet(doc, citation_scope)
        refmap = dom_ref if doc["doc_type"] == "article" else twi_ref
        for ln in _doc_links(doc):
            refmap.setdefault(ln["media_ref"], []).append(doc["domain"])
        for source in found:
            refmap.setdefault(source, []).append(doc["domain"])
        results[doc["doc_id"]] = {
            "citation_url_or_text_alias": cites,
            "citation_name": names,
            "anchor_text": anchors,
            "found_aliases": found,
        }
    # probe (processor.py:16-41)
    for doc in docs:
        refs = list(dom_ref.get(doc["url"], [])) + list(twi_ref.get(doc["url"], []))
        refs = list(dict.fromkeys(refs))
        if doc["doc_id"] in refs:
            refs.remove(doc["doc_id"])
        results[doc["doc_id"]]["referring_name"] = refs
        results[doc["doc_id"]]["number_of_referrals"] = len(refs)
    # decoration (processor_domain.py:94-108 / processor_twitter.py:86-108)
    by_source = {e["source"]: e for e in crawl_scope}
    for doc in docs:
        pub = tags = name = ""
        if doc["doc_type"] == "article":
            e = by_source.get(doc["domain"])
            if e:
                pub, tags, name = e.get("publisher", ""), e.get("tags", ""), e.get("name", "")
        else:
            for e in crawl_scope:
                for h in e.get("twitter_handles") or []:
                    if _handle_norm(h) == _handle_norm(doc["domain"]):
                        pub, tags, name = e.get("publisher", ""), e.get("tags", ""), e.get("name", "")
        results[doc["doc_id"]].update(
            {"associated_publisher": pub, "tags": tags, "name": name}
        )
    return results
