"""Port of the tokenizer + stopword list.

Reference: ``src/tools/StopWords.java:27-66`` (NLTK-style + web tokens),
``src/jobs/Indexer.java:214-241`` (tokenize, len<=25, stopword drop,
per-doc count, min-frequency 2) and ``src/jobs/TfIdf.java:293-312``
(same without the min-frequency gate).
"""
from __future__ import annotations

import re
from collections import Counter

STOP_WORDS = frozenset({
    # --- Standard English stop words (NLTK style) ---
    "a", "about", "above", "after", "again", "against", "ain", "all", "am", "an",
    "and", "any", "are", "aren", "aren't", "as", "at", "be", "because", "been",
    "before", "being", "below", "between", "both", "but", "by", "can", "couldn",
    "couldn't", "d", "did", "didn", "didn't", "do", "does", "doesn", "doesn't",
    "doing", "don", "don't", "down", "during", "each", "few", "for", "from",
    "further", "had", "hadn", "hadn't", "has", "hasn", "hasn't", "have", "haven",
    "haven't", "having", "he", "he'd", "he'll", "her", "here", "hers", "herself",
    "he's", "him", "himself", "his", "how", "i", "i'd", "if", "i'll", "i'm",
    "in", "into", "is", "isn", "isn't", "it", "it'd", "it'll", "it's", "its",
    "itself", "i've", "just", "ll", "m", "ma", "me", "mightn", "mightn't",
    "more", "most", "mustn", "mustn't", "my", "myself", "needn", "needn't",
    "no", "nor", "not", "now", "o", "of", "off", "on", "once", "only", "or",
    "other", "our", "ours", "ourselves", "out", "over", "own", "re", "s",
    "same", "shan", "shan't", "she", "she'd", "she'll", "she's", "should",
    "shouldn", "shouldn't", "should've", "so", "some", "such", "t", "than",
    "that", "that'll", "the", "their", "theirs", "them", "themselves", "then",
    "there", "these", "they", "they'd", "they'll", "they're", "they've",
    "this", "those", "through", "to", "too", "under", "until", "up", "ve",
    "very", "was", "wasn", "wasn't", "we", "we'd", "we'll", "we're", "were",
    "weren", "weren't", "we've", "what", "when", "where", "which", "while",
    "who", "whom", "why", "will", "with", "won", "won't", "wouldn",
    "wouldn't", "y", "you", "you'd", "you'll", "your", "you're", "yours",
    "yourself", "yourselves", "you've",
    # --- Extra web-specific high-frequency tokens ---
    "http", "https", "www", "com", "org", "net",
    "html", "htm", "css", "js", "javascript", "script", "href", "src", "img",
    "json", "xml", "utf", "utf8", "iso",
    "page", "pages", "site", "sites", "homepage", "home", "index",
    "nav", "menu", "footer", "header", "sidebar",
    "login", "logout", "signin", "signup", "register", "account",
    "cookie", "cookies", "policy", "policies", "privacy", "terms",
    "agreement", "copyright", "trademark",
    "click", "button", "submit", "search", "results", "filter",
})

MAX_WORD_LENGTH = 25
_NON_AZ = re.compile(r"[^a-z]+")


def is_stop_word(word: str) -> bool:
    return word.lower() in STOP_WORDS


def tokenize_counts(text: str) -> Counter[str]:
    """Token counts per reference semantics: lowercase, split on [^a-z]+,
    drop empty / len>25 / stopword tokens (Indexer.java:214-227,
    TfIdf.java:293-312)."""
    counts: Counter[str] = Counter()
    if not text:
        return counts
    for token in _NON_AZ.split(text.lower()):
        if not token or len(token) > MAX_WORD_LENGTH:
            continue
        if token in STOP_WORDS:
            continue
        counts[token] += 1
    return counts


def index_words(text: str, min_frequency: int = 2) -> set[str]:
    """Words a document contributes to the inverted index
    (count >= MIN_WORD_FREQUENCY_PER_DOCUMENT, Indexer.java:233-238)."""
    return {w for w, c in tokenize_counts(text).items() if c >= min_frequency}
