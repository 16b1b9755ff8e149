"""Typed error surface mirroring the reference's exception hierarchy
(reference: errors.py:1-74). Names are kept identical so a user of the
reference can port except-clauses unchanged; errors that only make
sense in the reference's multiprocessing architecture are omitted
(MultiprocessingParsingNotSupportedError) and noted here.
"""

from __future__ import annotations


class HolmesError(Exception):
    pass


# --- search-phrase validation (reference errors.py:9-26; raised from
# search-phrase compilation, reference parsing.py:2460-2632)

class SearchPhraseContainsNegationError(HolmesError):
    pass


class SearchPhraseContainsConjunctionError(HolmesError):
    pass


class SearchPhraseContainsCoreferringPronounError(HolmesError):
    pass


class SearchPhraseWithoutMatchableWordsError(HolmesError):
    pass


class SearchPhraseContainsMultipleClausesError(HolmesError):
    pass


# --- document lifecycle (reference errors.py:28-50)

class DuplicateDocumentError(HolmesError):
    pass


class NoSearchPhraseError(HolmesError):
    pass


class NoDocumentError(HolmesError):
    pass


class WrongModelDeserializationError(HolmesError):
    pass


class WrongVersionDeserializationError(HolmesError):
    pass


class DocumentTooBigError(HolmesError):
    pass


# --- classification (reference errors.py:52-58)

class FewerThanTwoClassificationsError(HolmesError):
    pass


class NoPhraseletsAfterFilteringError(HolmesError):
    pass


# --- configuration (reference errors.py:60-66)

class EmbeddingThresholdLessThanRelationThresholdError(HolmesError):
    pass
