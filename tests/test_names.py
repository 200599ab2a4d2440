"""Name normalization (P3/P4) — doctest-style goldens."""

from __future__ import annotations

import pytest

from datagouv_tools_spark.functions.names import sanitize, to_snake


@pytest.mark.parametrize(
    ("given", "expected"),
    [
        ("numeroVoieEtablissement", "numero_voie_etablissement"),
        ("prenom1UniteLegale", "prenom_1_unite_legale"),
        ("StockEtablissement", "stock_etablissement"),
        ("HTTPResponse", "http_response"),
        ("already_snake_case", "already_snake_case"),
        ("siren", "siren"),
        ("nomenclatureActivitePrincipaleUniteLegale", "nomenclature_activite_principale_unite_legale"),
        ("", ""),
        ("ABC", "abc"),
        ("a1B2", "a_1_b_2"),
    ],
)
def test_to_snake(given, expected):
    assert to_snake(given) == expected


def test_to_snake_idempotent():
    names = ["numeroVoieEtablissement", "HTTPResponse", "prenom1UniteLegale"]
    for n in names:
        once = to_snake(n)
        assert to_snake(once) == once


@pytest.mark.parametrize(
    ("given", "expected"),
    [
        ("LIBELLÉ DU CENTRE", "libelle_du_centre"),
        ("caractère d'annulation", "caractere_dannulation"),
        ("caractère du lieu-dit", "caractere_du_lieu_dit"),
        ("date de création de l'article", "date_de_creation_de_larticle"),
        ("population réelle", "population_reelle"),
        ("clé rivoli", "cle_rivoli"),
        ("numéro d'acte de décès", "numero_dacte_de_deces"),
    ],
)
def test_sanitize(given, expected):
    assert sanitize(given) == expected
