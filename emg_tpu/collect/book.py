"""Book sentence source with persistent bookmark (reference read_book.py).

Paragraphs split on blank lines, sentences via the nltk punkt tokenizer when
its data is available, else a regex splitter; reading position persists in a
``<book>.bookmark`` file across sessions.
"""

from __future__ import annotations

import os
import re


def _split_sentences(text: str):
    try:
        import nltk

        detector = nltk.data.load("tokenizers/punkt/english.pickle")
        return detector.tokenize(text)
    except Exception:
        # fallback: split at sentence punctuation followed by whitespace+upper
        parts = re.split(r"(?<=[.!?])\s+(?=[A-Z\"'])", text.strip())
        return [p for p in parts if p]


class Book:
    def __init__(self, book_file: str):
        self.file = book_file
        with open(book_file) as f:
            all_text = f.read()
        paragraphs = all_text.split("\n\n")
        sentences = [s for p in paragraphs for s in _split_sentences(p.strip()) if s]
        self.sentences = [s.replace("\n", " ") for s in sentences]

        bookmark = self.file + ".bookmark"
        if os.path.exists(bookmark):
            with open(bookmark) as f:
                self.current_index = int(f.read().strip())
        else:
            self.current_index = 0

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        with open(self.file + ".bookmark", "w") as f:
            f.write(str(self.current_index))

    def current_sentence(self) -> str:
        return self.sentences[self.current_index]

    def next(self):
        self.current_index = (self.current_index + 1) % len(self.sentences)
