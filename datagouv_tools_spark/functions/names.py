"""Identifier normalization (SURVEY §2.3 P3/P4, reference util.py:24-123).

Pure-Python, driver-side: these run on table/column/index *names*, never
on data rows, so they cost nothing at 100 TB. Semantics match the
reference's behavior (verified against its documented examples), the
implementation is original:

- ``to_snake``: camelCase → snake_case via Unicode-category word
  splitting; acronym runs stay one word; digits start a new word;
  idempotent on already-snake input.
- ``sanitize``: NFKD-decompose, strip diacritics to ASCII, whitespace →
  ``_``, casefold — for French captions becoming column names.
"""

from __future__ import annotations

import unicodedata

__all__ = ["to_snake", "sanitize", "rename_columns_to_snake"]


def _category(ch: str) -> str:
    return unicodedata.category(ch)


def to_snake(name: str) -> str:
    """Convert camelCase / PascalCase to snake_case.

    >>> to_snake("numeroVoieEtablissement")
    'numero_voie_etablissement'
    >>> to_snake("prenom1UniteLegale")
    'prenom_1_unite_legale'
    >>> to_snake("HTTPResponse")
    'http_response'
    >>> to_snake("already_snake_case")
    'already_snake_case'
    >>> to_snake("StockEtablissement")
    'stock_etablissement'
    """
    words: list[str] = []
    current: list[str] = []
    prev = ""  # previous char's coarse class: 'U', 'L', 'D' or ''

    def flush() -> None:
        if current:
            words.append("".join(current))
            current.clear()

    for ch in name:
        cat = _category(ch)
        if cat == "Lu":
            if prev != "U":
                flush()
            current.append(ch)
            prev = "U"
        elif cat.startswith("L"):
            if prev == "U" and len(current) > 1:
                # end of an acronym run: its last upper starts this word
                last = current.pop()
                flush()
                current.append(last)
            elif prev == "D" or prev == "":
                flush()
            current.append(ch)
            prev = "L"
        elif cat == "Nd":
            if prev != "D":
                flush()
            current.append(ch)
            prev = "D"
        else:
            flush()
            prev = ""
    flush()
    return "_".join(w.lower() for w in words)


def sanitize(text: str) -> str:
    """ASCII-fold and identifier-ize a free-text caption.

    >>> sanitize("LIBELLÉ DU CENTRE")
    'libelle_du_centre'
    >>> sanitize("Date de création")
    'date_de_creation'
    >>> sanitize("  spaced   out  ")
    'spaced_out'
    >>> sanitize("caractère d'annulation")
    'caractere_dannulation'
    >>> sanitize("caractère du lieu-dit")
    'caractere_du_lieu_dit'
    >>> sanitize("date de création de l'article")
    'date_de_creation_de_larticle'

    Idempotent: '_' counts as a separator (else a second pass would
    strip the underscores a first pass introduced).

    >>> sanitize(sanitize("Date de création")) == sanitize("Date de création")
    True
    """
    decomposed = unicodedata.normalize("NFKD", text)
    ascii_text = "".join(ch for ch in decomposed if not unicodedata.combining(ch))
    ascii_text = ascii_text.encode("ascii", "ignore").decode("ascii")
    ascii_text = ascii_text.replace("-", " ").replace("_", " ")
    ascii_text = "".join(ch for ch in ascii_text if ch.isalnum() or ch.isspace())
    return "_".join(ascii_text.casefold().split())


def rename_columns_to_snake(df, process_names=to_snake):
    """Apply a naming strategy to every column of a DataFrame (U3 hook;
    ``process_names=None`` → identity, as in the reference)."""
    if process_names is None:
        return df
    return df.toDF(*[process_names(c) for c in df.columns])
