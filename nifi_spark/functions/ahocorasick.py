"""Aho-Corasick multi-pattern matcher — ScanContent's large-dictionary
scale path.

NiFi's ScanContent (standard/ScanContent.java — delegates to
nifi-utils' search package) runs an Aho-Corasick automaton over the
content bytes: O(len + hits) per document regardless of dictionary
size. The engine's default `scan_content` keeps matching JVM-side as
a codegen'd exists() over a literal term array — unbeatable for the
dictionary sizes the reference's tests use, but O(len·terms). This
module is the automaton for the other regime (10^4..10^6 terms):
built once driver-side, shipped to executors in the mapInPandas
closure (same broadcast-sized contract as the literal array), and
linear per row.

Classic construction (Aho & Corasick 1975): a trie of terms, BFS
failure links (longest proper suffix that is also a trie prefix), and
output sets merged through the failure chain at build time so search
never walks failure links for outputs.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Build once, search many. Works on str or bytes terms (mixing
    raises); search input must be the same kind."""

    def __init__(self, terms):
        terms = list(terms)
        if not terms:
            raise ValueError("need at least one term")
        kinds = {type(t) for t in terms}
        if len(kinds) != 1 or kinds & {str, bytes} != kinds:
            raise ValueError("terms must be all str or all bytes")
        self._goto: list[dict] = [{}]
        out: list[set] = [set()]
        for term in terms:
            if not term:
                raise ValueError("empty term")
            node = 0
            for ch in term:
                nxt = self._goto[node].get(ch)
                if nxt is None:
                    self._goto.append({})
                    out.append(set())
                    nxt = len(self._goto) - 1
                    self._goto[node][ch] = nxt
                node = nxt
            out[node].add(term)
        # BFS failure links; merge outputs through the chain
        fail = [0] * len(self._goto)
        q = deque()
        for child in self._goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self._goto[node].items():
                q.append(child)
                f = fail[node]
                while f and ch not in self._goto[f]:
                    f = fail[f]
                fail[child] = self._goto[f].get(ch, 0)
                if fail[child] == child:
                    fail[child] = 0
                out[child] |= out[fail[child]]
        self._fail = fail
        self._out = [frozenset(s) for s in out]

    def search(self, text):
        """→ set of matched terms (membership semantics — what
        ScanContent's matched/unmatched routing needs)."""
        node = 0
        hits: set = set()
        goto, fail, out = self._goto, self._fail, self._out
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                hits |= out[node]
        return hits

    def finditer(self, text):
        """→ [(end_index_exclusive, term)] in scan order."""
        node = 0
        res = []
        goto, fail, out = self._goto, self._fail, self._out
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            for term in out[node]:
                res.append((i + 1, term))
        return res
