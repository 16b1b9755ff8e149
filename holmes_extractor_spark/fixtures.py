"""Deterministic synthetic `pages` corpus (Common-Crawl-style shape).

Input-table contract per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

The corpus is a pure integer-arithmetic function of ``documents.doc_id``
(the driver-provided table), so the exact same corpus can be generated
by a Spark expression pipeline AND by a DuckDB SQL CTE — which is what
lets the driver's oracle verify the full KG pipeline value-for-value:

    lang(i)     = 'de' if i % 7 == 3 else 'en'
    n_snips(i)  = 1 + (i % 5)
    snip(i, j)  = POOL_lang[(i*31 + j*17) % len(POOL_lang)]
    text(i)     = ' '.join(snip(i, j) for j in range(n_snips(i)))
    url(i)      = 'https://example.org/doc-' || i
    warc_ts(i)  = TIMESTAMP '2024-01-01' + i seconds
    html(i)     = '<html><body><p>' || text || '</p></body></html>'

Snippet sentences are drawn verbatim from the reference's test suites
(reference: tests/en/test_structural_matching_EN.py,
tests/en/test_phraselet_production_EN.py:76-90,
tests/de/test_semantics_DE.py) so holmes-documented goldens apply.

GOLDEN_EDGES / GOLDEN_WORDS freeze the engine's verified per-snippet
output (reviewed against the reference's documented behavior, e.g.
"A plant grows" → ``predicate-actor: grow-plant`` + ``word: plant``,
reference tests/en/test_phraselet_production_EN.py:76-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ----------------------------------------------------------- the pools

POOL_EN: list[str] = [
    'The dog chased the cat.',  # 0
    'The cat was chased by the dog.',  # 1
    'The dog did not chase the cat.',  # 2
    'No dog chased any cat.',  # 3
    'I saw a cat. It was chased by the dog.',  # 4
    'Richard Paul Hudson came home.',  # 5
    'A plant grows.',  # 6
    'A plant grows up quickly.',  # 7
    'The man was poor.',  # 8
    'The rich man came home.',  # 9
    'Somebody gives a file to an employee.',  # 10
    'The dog of the man chased the cat.',  # 11
    'Three dogs chased a cat.',  # 12
    'The man sang in the garden.',  # 13
    'Who came?',  # 14
    'The man who chased the cat came home.',  # 15
    'The cat that the dog chased was old.',  # 16
    'The man decided to open an account.',  # 17
    'The man saw the dog in the garden.',  # 18
    'A holiday is hard to book.',  # 19
    'A plant is grown.',  # 20
    'The sailors sailed rapidly.',  # 21
    'A hobby plant grew.',  # 22
    "A gardener's plant grew.",  # 23
    "A gardener's healthy hobby plant grows in the sun.",  # 24
    'A healthy plant grew.',  # 25
    'Information extraction progresses with information.',  # 26
    'The man needs insurance for five years.',  # 27
    'Somebody gives something to a plant.',  # 28
    'Who opened the door?',  # 29
    'The dog will chase the cat.',  # 30
    'The dog never chased the cat.',  # 31
    'The dog and the lion chased the cat.',  # 32
    'The dog chased the cat and the mouse.',  # 33
    'A lion chased a mouse.',  # 34
    'The hound chased the kitten.',  # 35
    'The man opened an account.',  # 36
    'An employee needs insurance.',  # 37
    'Richard Paul Hudson opened an account.',  # 38
    'Mary came home.',  # 39
    'The old king came home.',  # 40
    'The dog was chased by the lion.',  # 41
    'Three lions chased two mice.',  # 42
    'The man decided to buy a house.',  # 43
    'The woman tried to open the door.',  # 44
    'The man saw the woman in the house.',  # 45
    'I saw a dog. It was chasing a cat and a cat.',  # 46
    'A holiday is easy to book.',  # 47
    'The account was opened by the manager.',  # 48
    'The information was extracted.',  # 49
    'Houses are built quickly.',  # 50
    'The child found a dog in the garden.',  # 51
    'The author wrote a book.',  # 52
    'Dogs chase cats.',  # 53
    'The farmer planted a tree.',  # 54
    'A bird ate the food.',  # 55
    'The student read the book.',  # 56
    'The doctor helped the child.',  # 57
    'A king bought a horse.',  # 58
    'The nurse watched the children.',  # 59
    'The hunter caught a fox.',  # 60
    'The boy broke the window.',  # 61
    'A woman sold the car.',  # 62
    'A teacher explained the lesson.',  # 63
    'A child threw the ball.',  # 64
    'The cat ate a mouse.',  # 65
    'The rich man sang quickly.',  # 66
    'The sick woman slept.',  # 67
    'The famous author visited the village.',  # 68
    'The workers repaired the bridge.',  # 69
    'A girl painted a picture.',  # 70
    'The criminal stole the car.',  # 71
    'The manager delivered a letter to the employee.',  # 72
    'The ship sank in the sea.',  # 73
    'The boat approached the bridge.',  # 74
    'The king of the castle bought a horse.',  # 75
    'The cook washed the dishes.',  # 76
    'The king sang in the castle.',  # 77
    'The doctor visited the sick child.',  # 78
    'The gentle teacher helped the students.',  # 79
    'No man opened the door.',  # 80
    'The boy did not break the window.',  # 81
    'The girl never visited the castle.',  # 82
    'An old woman fed the birds.',  # 83
    'The strong man carried the table.',  # 84
    'A small dog barked.',  # 85
    'The tired child slept in the house.',  # 86
    'The man of the house opened the door.',  # 87
    'Two birds flew over the river.',  # 88
    'John came home.',  # 89
    'The happy girl sang a song.',  # 90
    'The big cat creature chased the kitten.',  # 91
    'I saw a dog. It barked. It was hungry.',  # 92
    'The tired dog slept.',  # 93
    'The man whose dog chased the cat came home.',  # 94 (whose-relative)
    'The cat the dog chased was tired.',  # 95 (bare relative, relant)
    'The dog chased the cat who told nobody.',  # 96 (final relative)
    'The dog, the wolf and the hound chased the cat.',  # 97 (comma-conjunct chain)
    'The mouse ordered the dog to chase the cat.',  # 98 (object control)
    'The dog decided to be chased.',  # 99 (passive infinitival complement)
    'The large and strong dog came home.',  # 100 (adjective conjunction)
    'The dog who chased and caught the cat was tired.',  # 101 (relative verb conjunction)
    'The cat and the mouse that the dog chased were tired.',  # 102 (conjoined antecedents)
    'The dog was thinking about chasing a cat.',  # 103 (prepositional complement)
    'Somebody talked about the cat chased by the dog.',  # 104 (reduced passive relative)
    'The dog should chase the cat.',  # 105 (modal uncertainty)
]

POOL_DE: list[str] = [
    'Der Hund jagte die Katze.',  # 106
    'Polizeiinformation über Kriminelle.',  # 107
    'Der reiche Mann kam nach Hause.',  # 108
    'Die Katze wurde vom Hund gejagt.',  # 109
    'Der Hund jagte die Katze nicht.',  # 110
    'Der Hund jagte die Katze und die Maus.',  # 111
    'Die Polizei jagte den Kriminellen.',  # 112
    'Die Katze wurde nicht gejagt.',  # 113
    'Der kleine Hund sah die Katze.',  # 114
    'Die Wohnungsgesellschaft verkaufte das Haus.',  # 115
    'Das Kind öffnete die Tür.',  # 116
    'Der reiche Mann kaufte ein Auto.',  # 117
    'Die Versicherungsgesellschaft informierte den Mann.',  # 118
    'Der Mann sah den Hund im Garten.',  # 119
    'Die Frau las ein Buch.',  # 120
    'Die Kinder spielten im Garten.',  # 121
    'Die Polizeiinformationsbroschüre ist interessant.',  # 122
    'Die Frau gab dem Mann das Buch.',  # 123 (double object, verb-dat)
    'Der Mann wurde vom Kriminellen gesehen.',  # 124 (de passive)
    'Die kleine Katze schlief im Garten.',  # 125
    'Der Lehrer baute ein Haus.',  # 126
    'Der Hund und der Löwe jagten die Katze.',  # 127 (de conjunction)
    'Der große und starke Hund kam heim.',  # 128 (de adjective conjunction)
]

# ------------------------------------------- golden per-snippet output
# (snip_id, template, label, subj, obj, pred, negated, uncertain, coref)
# NOTE: by/of/to prepositions are UNMATCHABLE in the reference (en
# language_specific_rules.py:615-617) — they carry pobjb/pobjo/pobjt
# deps instead — so no prep-noun phraselets exist for them.
# Each snippet block cites its reference provenance: transcribed test
# expectations where available, else the template rules that define it.
POOL = POOL_EN + POOL_DE  # global snippet ids: EN then DE

# Copular snippets additionally carry reverse-only be-parented
# phraselets (predicate-actor: be-X via nsubj, governor-adjective:
# be-ADJ via acomp): the reference's VB* parent tags admit the copula
# and the reverse-only parent-lemma list marks them reverse-only
# (en language_specific_rules.py:834-845, 1114-1214).
GOLDEN_EDGES: list[tuple] = [
    (0, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (0, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (1, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (1, 'predicate-passivesubject', 'predicate-passivesubject: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (2, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', True, False, False),
    (2, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', True, False, False),
    (3, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', True, False, False),
    (3, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (4, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (4, 'predicate-passivesubject', 'predicate-passivesubject: chase-cat', 'chase', 'cat', 'chase', False, False, True),
    (4, 'predicate-patient', 'predicate-patient: see-cat', 'see', 'cat', 'see', False, False, False),
    (5, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    (5, 'predicate-actor', 'predicate-actor: come-richard paul hudson', 'richard paul hudson', 'come', 'come', False, False, False),
    (6, 'predicate-actor', 'predicate-actor: grow-plant', 'plant', 'grow', 'grow', False, False, False),
    (7, 'governor-adjective', 'governor-adjective: grow up-quick', 'grow up', 'quick', 'grow up', False, False, False),
    (7, 'predicate-actor', 'predicate-actor: grow up-plant', 'plant', 'grow up', 'grow up', False, False, False),
    (8, 'governor-adjective', 'governor-adjective: man-poor', 'man', 'poor', 'man', False, False, False),
    (8, 'governor-adjective', 'governor-adjective: be-poor', 'be', 'poor', 'be', False, False, False),
    (8, 'predicate-actor', 'predicate-actor: be-man', 'man', 'be', 'be', False, False, False),
    (9, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    (9, 'governor-adjective', 'governor-adjective: man-rich', 'man', 'rich', 'man', False, False, False),
    (9, 'predicate-actor', 'predicate-actor: come-man', 'man', 'come', 'come', False, False, False),
    (10, 'predicate-patient', 'predicate-patient: gift-file', 'gift', 'file', 'gift', False, False, False),
    (10, 'predicate-recipient', 'predicate-recipient: gift-employee', 'gift', 'employee', 'gift', False, False, False),
    (11, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (11, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (11, 'word-ofword', 'word-ofword: dog-man', 'dog', 'man', 'dog', False, False, False),
    (12, 'number-noun', 'number-noun: dog-three', 'dog', 'three', 'dog', False, False, False),
    (12, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (12, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (13, 'predicate-actor', 'predicate-actor: sing-man', 'man', 'sing', 'sing', False, False, False),
    (13, 'prep-noun', 'prep-noun: in-garden', 'in', 'garden', 'in', False, False, False),
    (13, 'prepgovernor-noun', 'prepgovernor-noun: sing-garden', 'sing', 'garden', 'sing', False, False, False),
    (15, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    (15, 'predicate-actor', 'predicate-actor: chase-man', 'man', 'chase', 'chase', False, False, False),
    (15, 'predicate-actor', 'predicate-actor: come-man', 'man', 'come', 'come', False, False, False),
    (15, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (16, 'governor-adjective', 'governor-adjective: cat-old', 'cat', 'old', 'cat', False, False, False),
    (16, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (16, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (16, 'governor-adjective', 'governor-adjective: be-old', 'be', 'old', 'be', False, False, False),
    (16, 'predicate-actor', 'predicate-actor: be-cat', 'cat', 'be', 'be', False, False, False),
    (17, 'predicate-actor', 'predicate-actor: decide-man', 'man', 'decide', 'decide', False, False, False),
    (17, 'predicate-actor', 'predicate-actor: open-man', 'man', 'open', 'open', False, True, False),
    (17, 'predicate-patient', 'predicate-patient: decide-open', 'decide', 'open', 'decide', False, False, False),
    (17, 'predicate-patient', 'predicate-patient: open-account', 'open', 'account', 'open', False, False, False),
    (18, 'predicate-actor', 'predicate-actor: see-man', 'man', 'see', 'see', False, False, False),
    (18, 'predicate-patient', 'predicate-patient: see-dog', 'see', 'dog', 'see', False, False, False),
    (18, 'prep-noun', 'prep-noun: in-garden', 'in', 'garden', 'in', False, False, False),
    (18, 'prepgovernor-noun', 'prepgovernor-noun: dog-garden', 'dog', 'garden', 'dog', False, True, False),
    (18, 'prepgovernor-noun', 'prepgovernor-noun: see-garden', 'see', 'garden', 'see', False, False, False),
    (19, 'governor-adjective', 'governor-adjective: holiday-hard', 'holiday', 'hard', 'holiday', False, False, False),
    (19, 'predicate-toughmovedargument', 'predicate-toughmovedargument: book-holiday', 'book', 'holiday', 'book', False, True, False),
    (19, 'governor-adjective', 'governor-adjective: be-hard', 'be', 'hard', 'be', False, False, False),
    (19, 'predicate-actor', 'predicate-actor: be-holiday', 'holiday', 'be', 'be', False, False, False),
    (47, 'governor-adjective', 'governor-adjective: be-ease', 'be', 'ease', 'be', False, False, False),
    (47, 'predicate-actor', 'predicate-actor: be-holiday', 'holiday', 'be', 'be', False, False, False),
    (92, 'governor-adjective', 'governor-adjective: be-hunger', 'be', 'hunger', 'be', False, False, False),
    (92, 'predicate-actor', 'predicate-actor: be-dog', 'dog', 'be', 'be', False, False, True),
    (95, 'governor-adjective', 'governor-adjective: be-tire', 'be', 'tire', 'be', False, False, False),
    (95, 'predicate-actor', 'predicate-actor: be-cat', 'cat', 'be', 'be', False, False, False),
    (101, 'governor-adjective', 'governor-adjective: be-tire', 'be', 'tire', 'be', False, False, False),
    (101, 'predicate-actor', 'predicate-actor: be-dog', 'dog', 'be', 'be', False, False, False),
    (102, 'governor-adjective', 'governor-adjective: be-tire', 'be', 'tire', 'be', False, False, False),
    (102, 'predicate-actor', 'predicate-actor: be-cat', 'cat', 'be', 'be', False, True, False),
    (102, 'predicate-actor', 'predicate-actor: be-mouse', 'mouse', 'be', 'be', False, False, False),
    # 20: 'A plant is grown.' — ref tests/en/test_phraselet_production_EN.py:96-99
    (20, 'predicate-passivesubject', 'predicate-passivesubject: grow-plant', 'grow', 'plant', 'grow', False, False, False),
    # 21: 'The sailors sailed rapidly.' — ref tests/en/test_phraselet_production_EN.py:115-118
    # (subject NP substituted for the pronoun to keep the snippet
    # coref-inert under document concatenation)
    (21, 'governor-adjective', 'governor-adjective: sail-rapid', 'sail', 'rapid', 'sail', False, False, False),
    (21, 'predicate-actor', 'predicate-actor: sail-sailor', 'sailor', 'sail', 'sail', False, False, False),
    # 22: 'A hobby plant grew.' — ref tests/en/test_phraselet_production_EN.py:122-125
    (22, 'noun-noun', 'noun-noun: plant-hobby', 'plant', 'hobby', 'plant', False, False, False),
    (22, 'predicate-actor', 'predicate-actor: grow-plant', 'plant', 'grow', 'grow', False, False, False),
    # 23: "A gardener's plant grew." — ref tests/en/test_phraselet_production_EN.py:127-130
    (23, 'predicate-actor', 'predicate-actor: grow-plant', 'plant', 'grow', 'grow', False, False, False),
    (23, 'word-ofword', 'word-ofword: plant-gardener', 'plant', 'gardener', 'plant', False, False, False),
    # 24: "A gardener's healthy hobby plant grows in the sun." — ref tests/en/test_phraselet_production_EN.py:133-141
    (24, 'governor-adjective', 'governor-adjective: plant-healthy', 'plant', 'healthy', 'plant', False, False, False),
    (24, 'noun-noun', 'noun-noun: plant-hobby', 'plant', 'hobby', 'plant', False, False, False),
    (24, 'predicate-actor', 'predicate-actor: grow-plant', 'plant', 'grow', 'grow', False, False, False),
    (24, 'prep-noun', 'prep-noun: in-sun', 'in', 'sun', 'in', False, False, False),
    (24, 'prepgovernor-noun', 'prepgovernor-noun: grow-sun', 'grow', 'sun', 'grow', False, False, False),
    (24, 'word-ofword', 'word-ofword: plant-gardener', 'plant', 'gardener', 'plant', False, False, False),
    # 25: 'A healthy plant grew.' — ref tests/en/test_phraselet_production_EN.py:105-108
    (25, 'governor-adjective', 'governor-adjective: plant-healthy', 'plant', 'healthy', 'plant', False, False, False),
    (25, 'predicate-actor', 'predicate-actor: grow-plant', 'plant', 'grow', 'grow', False, False, False),
    # 26: 'Information extraction progresses with information.' — ref tests/en/test_phraselet_production_EN.py:186-190
    (26, 'noun-noun', 'noun-noun: extract-inform', 'extract', 'inform', 'extract', False, False, False),
    (26, 'predicate-actor', 'predicate-actor: progress-extract', 'extract', 'progress', 'progress', False, False, False),
    (26, 'prep-noun', 'prep-noun: with-inform', 'with', 'inform', 'with', False, False, False),
    (26, 'prepgovernor-noun', 'prepgovernor-noun: progress-inform', 'progress', 'inform', 'progress', False, False, False),
    # 27: 'The man needs insurance for five years.' — ref tests/en/test_phraselet_production_EN.py:263-275
    # (subject NP substituted for the pronoun, as above)
    (27, 'number-noun', 'number-noun: year-five', 'year', 'five', 'year', False, False, False),
    (27, 'predicate-actor', 'predicate-actor: need-man', 'man', 'need', 'need', False, False, False),
    (27, 'predicate-patient', 'predicate-patient: need-insurance', 'need', 'insurance', 'need', False, False, False),
    (27, 'prep-noun', 'prep-noun: for-year', 'for', 'year', 'for', False, False, False),
    (27, 'prepgovernor-noun', 'prepgovernor-noun: insurance-year', 'insurance', 'year', 'insurance', False, True, False),
    (27, 'prepgovernor-noun', 'prepgovernor-noun: need-year', 'need', 'year', 'need', False, False, False),
    # 28: 'Somebody gives something to a plant.' — ref tests/en/test_phraselet_production_EN.py:101-103
    (28, 'predicate-recipient', 'predicate-recipient: gift-plant', 'gift', 'plant', 'gift', False, False, False),
    # 29: 'Who opened the door?' — ref tests/en/test_phraselet_production_EN.py:303-312
    (29, 'predicate-patient', 'predicate-patient: open-door', 'open', 'door', 'open', False, False, False),
    # 30: 'The dog will chase the cat.' — ref tests/en/test_structural_matching_EN.py:505-516
    (30, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (30, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    # 31: 'The dog never chased the cat.' — ref tests/en/test_structural_matching_EN.py:456-466
    (31, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', True, False, False),
    (31, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', True, False, False),
    # 32: 'The dog and the lion chased the cat.' — ref tests/en/test_structural_matching_EN.py:423-445
    (32, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (32, 'predicate-actor', 'predicate-actor: chase-lion', 'lion', 'chase', 'chase', False, False, False),
    (32, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    # 33: 'The dog chased the cat and the mouse.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (33, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (33, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (33, 'predicate-patient', 'predicate-patient: chase-mouse', 'chase', 'mouse', 'chase', False, False, False),
    # 34: 'A lion chased a mouse.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (34, 'predicate-actor', 'predicate-actor: chase-lion', 'lion', 'chase', 'chase', False, False, False),
    (34, 'predicate-patient', 'predicate-patient: chase-mouse', 'chase', 'mouse', 'chase', False, False, False),
    # 35: 'The hound chased the kitten.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (35, 'predicate-actor', 'predicate-actor: chase-hound', 'hound', 'chase', 'chase', False, False, False),
    (35, 'predicate-patient', 'predicate-patient: chase-kitten', 'chase', 'kitten', 'chase', False, False, False),
    # 36: 'The man opened an account.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (36, 'predicate-actor', 'predicate-actor: open-man', 'man', 'open', 'open', False, False, False),
    (36, 'predicate-patient', 'predicate-patient: open-account', 'open', 'account', 'open', False, False, False),
    # 37: 'An employee needs insurance.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (37, 'predicate-actor', 'predicate-actor: need-employee', 'employee', 'need', 'need', False, False, False),
    (37, 'predicate-patient', 'predicate-patient: need-insurance', 'need', 'insurance', 'need', False, False, False),
    # 38: 'Richard Paul Hudson opened an account.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (38, 'predicate-actor', 'predicate-actor: open-richard paul hudson', 'richard paul hudson', 'open', 'open', False, False, False),
    (38, 'predicate-patient', 'predicate-patient: open-account', 'open', 'account', 'open', False, False, False),
    # 39: 'Mary came home.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (39, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    (39, 'predicate-actor', 'predicate-actor: come-mary', 'mary', 'come', 'come', False, False, False),
    # 40: 'The old king came home.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (40, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    (40, 'governor-adjective', 'governor-adjective: king-old', 'king', 'old', 'king', False, False, False),
    (40, 'predicate-actor', 'predicate-actor: come-king', 'king', 'come', 'come', False, False, False),
    # 41: 'The dog was chased by the lion.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (41, 'predicate-actor', 'predicate-actor: chase-lion', 'lion', 'chase', 'chase', False, False, False),
    (41, 'predicate-passivesubject', 'predicate-passivesubject: chase-dog', 'chase', 'dog', 'chase', False, False, False),
    # 42: 'Three lions chased two mice.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (42, 'number-noun', 'number-noun: lion-three', 'lion', 'three', 'lion', False, False, False),
    (42, 'number-noun', 'number-noun: mouse-two', 'mouse', 'two', 'mouse', False, False, False),
    (42, 'predicate-actor', 'predicate-actor: chase-lion', 'lion', 'chase', 'chase', False, False, False),
    (42, 'predicate-patient', 'predicate-patient: chase-mouse', 'chase', 'mouse', 'chase', False, False, False),
    # 43: 'The man decided to buy a house.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (43, 'predicate-actor', 'predicate-actor: buy-man', 'man', 'buy', 'buy', False, True, False),
    (43, 'predicate-actor', 'predicate-actor: decide-man', 'man', 'decide', 'decide', False, False, False),
    (43, 'predicate-patient', 'predicate-patient: buy-house', 'buy', 'house', 'buy', False, False, False),
    (43, 'predicate-patient', 'predicate-patient: decide-buy', 'decide', 'buy', 'decide', False, False, False),
    # 44: 'The woman tried to open the door.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (44, 'predicate-actor', 'predicate-actor: open-woman', 'woman', 'open', 'open', False, True, False),
    (44, 'predicate-actor', 'predicate-actor: try-woman', 'woman', 'try', 'try', False, False, False),
    (44, 'predicate-patient', 'predicate-patient: open-door', 'open', 'door', 'open', False, False, False),
    (44, 'predicate-patient', 'predicate-patient: try-open', 'try', 'open', 'try', False, False, False),
    # 45: 'The man saw the woman in the house.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (45, 'predicate-actor', 'predicate-actor: see-man', 'man', 'see', 'see', False, False, False),
    (45, 'predicate-patient', 'predicate-patient: see-woman', 'see', 'woman', 'see', False, False, False),
    (45, 'prep-noun', 'prep-noun: in-house', 'in', 'house', 'in', False, False, False),
    (45, 'prepgovernor-noun', 'prepgovernor-noun: see-house', 'see', 'house', 'see', False, False, False),
    (45, 'prepgovernor-noun', 'prepgovernor-noun: woman-house', 'woman', 'house', 'woman', False, True, False),
    # 46: 'I saw a dog. It was chasing a cat and a cat.' — ref tests/en/test_phraselet_production_EN.py:288-293 (It-coref variant)
    (46, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, True),
    (46, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (46, 'predicate-patient', 'predicate-patient: see-dog', 'see', 'dog', 'see', False, False, False),
    # 47: 'A holiday is easy to book.' — ref derivation.csv:160 (ease,easy)
    (47, 'governor-adjective', 'governor-adjective: holiday-ease', 'holiday', 'ease', 'holiday', False, False, False),
    (47, 'predicate-toughmovedargument', 'predicate-toughmovedargument: book-holiday', 'book', 'holiday', 'book', False, True, False),
    # 48: 'The account was opened by the manager.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (48, 'predicate-actor', 'predicate-actor: open-manager', 'manager', 'open', 'open', False, False, False),
    (48, 'predicate-passivesubject', 'predicate-passivesubject: open-account', 'open', 'account', 'open', False, False, False),
    # 49: 'The information was extracted.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (49, 'predicate-passivesubject', 'predicate-passivesubject: extract-inform', 'extract', 'inform', 'extract', False, False, False),
    # 50: 'Houses are built quickly.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (50, 'governor-adjective', 'governor-adjective: build-quick', 'build', 'quick', 'build', False, False, False),
    (50, 'predicate-passivesubject', 'predicate-passivesubject: build-house', 'build', 'house', 'build', False, False, False),
    # 51: 'The child found a dog in the garden.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (51, 'predicate-actor', 'predicate-actor: find-child', 'child', 'find', 'find', False, False, False),
    (51, 'predicate-patient', 'predicate-patient: find-dog', 'find', 'dog', 'find', False, False, False),
    (51, 'prep-noun', 'prep-noun: in-garden', 'in', 'garden', 'in', False, False, False),
    (51, 'prepgovernor-noun', 'prepgovernor-noun: dog-garden', 'dog', 'garden', 'dog', False, True, False),
    (51, 'prepgovernor-noun', 'prepgovernor-noun: find-garden', 'find', 'garden', 'find', False, False, False),
    # 52: 'The author wrote a book.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (52, 'predicate-actor', 'predicate-actor: write-author', 'author', 'write', 'write', False, False, False),
    (52, 'predicate-patient', 'predicate-patient: write-book', 'write', 'book', 'write', False, False, False),
    # 53: 'Dogs chase cats.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (53, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (53, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    # 54: 'The farmer planted a tree.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (54, 'predicate-actor', 'predicate-actor: plant-farmer', 'farmer', 'plant', 'plant', False, False, False),
    (54, 'predicate-patient', 'predicate-patient: plant-tree', 'plant', 'tree', 'plant', False, False, False),
    # 55: 'A bird ate the food.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (55, 'predicate-actor', 'predicate-actor: eat-bird', 'bird', 'eat', 'eat', False, False, False),
    (55, 'predicate-patient', 'predicate-patient: eat-food', 'eat', 'food', 'eat', False, False, False),
    # 56: 'The student read the book.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (56, 'predicate-actor', 'predicate-actor: read-student', 'student', 'read', 'read', False, False, False),
    (56, 'predicate-patient', 'predicate-patient: read-book', 'read', 'book', 'read', False, False, False),
    # 57: 'The doctor helped the child.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (57, 'predicate-actor', 'predicate-actor: help-doctor', 'doctor', 'help', 'help', False, False, False),
    (57, 'predicate-patient', 'predicate-patient: help-child', 'help', 'child', 'help', False, False, False),
    # 58: 'A king bought a horse.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (58, 'predicate-actor', 'predicate-actor: buy-king', 'king', 'buy', 'buy', False, False, False),
    (58, 'predicate-patient', 'predicate-patient: buy-horse', 'buy', 'horse', 'buy', False, False, False),
    # 59: 'The nurse watched the children.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (59, 'predicate-actor', 'predicate-actor: watch-nurse', 'nurse', 'watch', 'watch', False, False, False),
    (59, 'predicate-patient', 'predicate-patient: watch-child', 'watch', 'child', 'watch', False, False, False),
    # 60: 'The hunter caught a fox.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (60, 'predicate-actor', 'predicate-actor: catch-hunter', 'hunter', 'catch', 'catch', False, False, False),
    (60, 'predicate-patient', 'predicate-patient: catch-fox', 'catch', 'fox', 'catch', False, False, False),
    # 61: 'The boy broke the window.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (61, 'predicate-actor', 'predicate-actor: break-boy', 'boy', 'break', 'break', False, False, False),
    (61, 'predicate-patient', 'predicate-patient: break-window', 'break', 'window', 'break', False, False, False),
    # 62: 'A woman sold the car.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (62, 'predicate-actor', 'predicate-actor: sell-woman', 'woman', 'sell', 'sell', False, False, False),
    (62, 'predicate-patient', 'predicate-patient: sell-car', 'sell', 'car', 'sell', False, False, False),
    # 63: 'A teacher explained the lesson.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (63, 'predicate-actor', 'predicate-actor: explain-teacher', 'teacher', 'explain', 'explain', False, False, False),
    (63, 'predicate-patient', 'predicate-patient: explain-lesson', 'explain', 'lesson', 'explain', False, False, False),
    # 64: 'A child threw the ball.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (64, 'predicate-actor', 'predicate-actor: throw-child', 'child', 'throw', 'throw', False, False, False),
    (64, 'predicate-patient', 'predicate-patient: throw-ball', 'throw', 'ball', 'throw', False, False, False),
    # 65: 'The cat ate a mouse.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (65, 'predicate-actor', 'predicate-actor: eat-cat', 'cat', 'eat', 'eat', False, False, False),
    (65, 'predicate-patient', 'predicate-patient: eat-mouse', 'eat', 'mouse', 'eat', False, False, False),
    # 66: 'The rich man sang quickly.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (66, 'governor-adjective', 'governor-adjective: man-rich', 'man', 'rich', 'man', False, False, False),
    (66, 'governor-adjective', 'governor-adjective: sing-quick', 'sing', 'quick', 'sing', False, False, False),
    (66, 'predicate-actor', 'predicate-actor: sing-man', 'man', 'sing', 'sing', False, False, False),
    # 67: 'The sick woman slept.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (67, 'governor-adjective', 'governor-adjective: woman-sick', 'woman', 'sick', 'woman', False, False, False),
    (67, 'predicate-actor', 'predicate-actor: sleep-woman', 'woman', 'sleep', 'sleep', False, False, False),
    # 68: 'The famous author visited the village.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (68, 'governor-adjective', 'governor-adjective: author-famous', 'author', 'famous', 'author', False, False, False),
    (68, 'predicate-actor', 'predicate-actor: visit-author', 'author', 'visit', 'visit', False, False, False),
    (68, 'predicate-patient', 'predicate-patient: visit-village', 'visit', 'village', 'visit', False, False, False),
    # 69: 'The workers repaired the bridge.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (69, 'predicate-actor', 'predicate-actor: repair-worker', 'worker', 'repair', 'repair', False, False, False),
    (69, 'predicate-patient', 'predicate-patient: repair-bridge', 'repair', 'bridge', 'repair', False, False, False),
    # 70: 'A girl painted a picture.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (70, 'predicate-actor', 'predicate-actor: paint-girl', 'girl', 'paint', 'paint', False, False, False),
    (70, 'predicate-patient', 'predicate-patient: paint-picture', 'paint', 'picture', 'paint', False, False, False),
    # 71: 'The criminal stole the car.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (71, 'predicate-actor', 'predicate-actor: steal-criminal', 'criminal', 'steal', 'steal', False, False, False),
    (71, 'predicate-patient', 'predicate-patient: steal-car', 'steal', 'car', 'steal', False, False, False),
    # 72: 'The manager delivered a letter to the employee.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (72, 'predicate-actor', 'predicate-actor: deliver-manager', 'manager', 'deliver', 'deliver', False, False, False),
    (72, 'predicate-patient', 'predicate-patient: deliver-letter', 'deliver', 'letter', 'deliver', False, False, False),
    (72, 'predicate-recipient', 'predicate-recipient: deliver-employee', 'deliver', 'employee', 'deliver', False, False, False),
    # 73: 'The ship sank in the sea.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (73, 'predicate-actor', 'predicate-actor: sink-ship', 'ship', 'sink', 'sink', False, False, False),
    (73, 'prep-noun', 'prep-noun: in-sea', 'in', 'sea', 'in', False, False, False),
    (73, 'prepgovernor-noun', 'prepgovernor-noun: sink-sea', 'sink', 'sea', 'sink', False, False, False),
    # 74: 'The boat approached the bridge.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (74, 'predicate-actor', 'predicate-actor: approach-boat', 'boat', 'approach', 'approach', False, False, False),
    (74, 'predicate-patient', 'predicate-patient: approach-bridge', 'approach', 'bridge', 'approach', False, False, False),
    # 75: 'The king of the castle bought a horse.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (75, 'predicate-actor', 'predicate-actor: buy-king', 'king', 'buy', 'buy', False, False, False),
    (75, 'predicate-patient', 'predicate-patient: buy-horse', 'buy', 'horse', 'buy', False, False, False),
    (75, 'word-ofword', 'word-ofword: king-castle', 'king', 'castle', 'king', False, False, False),
    # 76: 'The cook washed the dishes.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (76, 'predicate-actor', 'predicate-actor: wash-cook', 'cook', 'wash', 'wash', False, False, False),
    (76, 'predicate-patient', 'predicate-patient: wash-dish', 'wash', 'dish', 'wash', False, False, False),
    # 77: 'The king sang in the castle.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (77, 'predicate-actor', 'predicate-actor: sing-king', 'king', 'sing', 'sing', False, False, False),
    (77, 'prep-noun', 'prep-noun: in-castle', 'in', 'castle', 'in', False, False, False),
    (77, 'prepgovernor-noun', 'prepgovernor-noun: sing-castle', 'sing', 'castle', 'sing', False, False, False),
    # 78: 'The doctor visited the sick child.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (78, 'governor-adjective', 'governor-adjective: child-sick', 'child', 'sick', 'child', False, False, False),
    (78, 'predicate-actor', 'predicate-actor: visit-doctor', 'doctor', 'visit', 'visit', False, False, False),
    (78, 'predicate-patient', 'predicate-patient: visit-child', 'visit', 'child', 'visit', False, False, False),
    # 79: 'The gentle teacher helped the students.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (79, 'governor-adjective', 'governor-adjective: teacher-gentle', 'teacher', 'gentle', 'teacher', False, False, False),
    (79, 'predicate-actor', 'predicate-actor: help-teacher', 'teacher', 'help', 'help', False, False, False),
    (79, 'predicate-patient', 'predicate-patient: help-student', 'help', 'student', 'help', False, False, False),
    # 80: 'No man opened the door.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (80, 'predicate-actor', 'predicate-actor: open-man', 'man', 'open', 'open', True, False, False),
    (80, 'predicate-patient', 'predicate-patient: open-door', 'open', 'door', 'open', False, False, False),
    # 81: 'The boy did not break the window.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (81, 'predicate-actor', 'predicate-actor: break-boy', 'boy', 'break', 'break', True, False, False),
    (81, 'predicate-patient', 'predicate-patient: break-window', 'break', 'window', 'break', True, False, False),
    # 82: 'The girl never visited the castle.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (82, 'predicate-actor', 'predicate-actor: visit-girl', 'girl', 'visit', 'visit', True, False, False),
    (82, 'predicate-patient', 'predicate-patient: visit-castle', 'visit', 'castle', 'visit', True, False, False),
    # 83: 'An old woman fed the birds.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (83, 'governor-adjective', 'governor-adjective: woman-old', 'woman', 'old', 'woman', False, False, False),
    (83, 'predicate-actor', 'predicate-actor: feed-woman', 'woman', 'feed', 'feed', False, False, False),
    (83, 'predicate-patient', 'predicate-patient: feed-bird', 'feed', 'bird', 'feed', False, False, False),
    # 84: 'The strong man carried the table.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (84, 'governor-adjective', 'governor-adjective: man-strong', 'man', 'strong', 'man', False, False, False),
    (84, 'predicate-actor', 'predicate-actor: carry-man', 'man', 'carry', 'carry', False, False, False),
    (84, 'predicate-patient', 'predicate-patient: carry-table', 'carry', 'table', 'carry', False, False, False),
    # 85: 'A small dog barked.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (85, 'governor-adjective', 'governor-adjective: dog-small', 'dog', 'small', 'dog', False, False, False),
    (85, 'predicate-actor', 'predicate-actor: bark-dog', 'dog', 'bark', 'bark', False, False, False),
    # 86: 'The tired child slept in the house.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (86, 'governor-adjective', 'governor-adjective: child-tire', 'child', 'tire', 'child', False, False, False),
    (86, 'predicate-actor', 'predicate-actor: sleep-child', 'child', 'sleep', 'sleep', False, False, False),
    (86, 'prep-noun', 'prep-noun: in-house', 'in', 'house', 'in', False, False, False),
    (86, 'prepgovernor-noun', 'prepgovernor-noun: sleep-house', 'sleep', 'house', 'sleep', False, False, False),
    # 87: 'The man of the house opened the door.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (87, 'predicate-actor', 'predicate-actor: open-man', 'man', 'open', 'open', False, False, False),
    (87, 'predicate-patient', 'predicate-patient: open-door', 'open', 'door', 'open', False, False, False),
    (87, 'word-ofword', 'word-ofword: man-house', 'man', 'house', 'man', False, False, False),
    # 88: 'Two birds flew over the river.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (88, 'number-noun', 'number-noun: bird-two', 'bird', 'two', 'bird', False, False, False),
    (88, 'predicate-actor', 'predicate-actor: fly-bird', 'bird', 'fly', 'fly', False, False, False),
    (88, 'prep-noun', 'prep-noun: over-river', 'over', 'river', 'over', False, False, False),
    (88, 'prepgovernor-noun', 'prepgovernor-noun: fly-river', 'fly', 'river', 'fly', False, False, False),
    # 89: 'John came home.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (89, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    (89, 'predicate-actor', 'predicate-actor: come-john', 'john', 'come', 'come', False, False, False),
    # 90: 'The happy girl sang a song.' — ref derived from the reference template rules (en language_specific_rules.py:1114-1325)
    (90, 'governor-adjective', 'governor-adjective: girl-happy', 'girl', 'happy', 'girl', False, False, False),
    (90, 'predicate-actor', 'predicate-actor: sing-girl', 'girl', 'sing', 'sing', False, False, False),
    (90, 'predicate-patient', 'predicate-patient: sing-song', 'sing', 'song', 'sing', False, False, False),
    # 95: 'The cat the dog chased was tired.' — bare object relative:
    # relant label (ref en language_specific_rules.py:362-365,
    # tests/en/test_semantics_EN.py:288-291); relant ∈ predicate-patient
    # template deps (:1114-1136); predicative 'tired' → amod antecedent
    (95, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (95, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (95, 'governor-adjective', 'governor-adjective: cat-tire', 'cat', 'tire', 'cat', False, False, False),
    # 96: 'The dog chased the cat who told nobody.' — sentence-final
    # relative; operator negation stays in the child clause (ref
    # tests/en/test_semantics_EN.py:132-134); 'nobody' is an unmatchable
    # generic pronoun so tell has no patient edge (ref parsing.py:1436-1448)
    (96, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (96, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (96, 'predicate-actor', 'predicate-actor: tell-cat', 'cat', 'tell', 'tell', True, False, False),
    # 97: 'The dog, the wolf and the hound chased the cat.' — comma
    # conjunct chain anchored on the first conjunct (ref
    # tests/en/test_semantics_EN.py:27-34); all conjuncts certain actors
    (97, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (97, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (97, 'predicate-actor', 'predicate-actor: chase-wolf', 'wolf', 'chase', 'chase', False, False, False),
    (97, 'predicate-actor', 'predicate-actor: chase-hound', 'hound', 'chase', 'chase', False, False, False),
    # 98: 'The mouse ordered the dog to chase the cat.' — object
    # control: the matrix object is the infinitive's uncertain subject
    # (ref tests/en/test_semantics_EN.py:182-185); xcomp →
    # predicate-patient order-chase (ref :1126-1136)
    (98, 'predicate-actor', 'predicate-actor: order-mouse', 'mouse', 'order', 'order', False, False, False),
    (98, 'predicate-patient', 'predicate-patient: order-dog', 'order', 'dog', 'order', False, False, False),
    (98, 'predicate-patient', 'predicate-patient: order-chase', 'order', 'chase', 'order', False, False, False),
    (98, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, True, False),
    (98, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    # 99: 'The dog decided to be chased.' — passive infinitival
    # complement: controller is the xcomp verb's uncertain passive
    # subject (ref tests/en/test_semantics_EN.py:187-190)
    (99, 'predicate-actor', 'predicate-actor: decide-dog', 'dog', 'decide', 'decide', False, False, False),
    (99, 'predicate-patient', 'predicate-patient: decide-chase', 'decide', 'chase', 'decide', False, False, False),
    (99, 'predicate-passivesubject', 'predicate-passivesubject: chase-dog', 'chase', 'dog', 'chase', False, True, False),
    # 100: 'The large and strong dog came home.' — conjoined attributive
    # adjectives both modify the head (ref tests/en/test_semantics_EN.py:53-57)
    (100, 'governor-adjective', 'governor-adjective: dog-large', 'dog', 'large', 'dog', False, False, False),
    (100, 'governor-adjective', 'governor-adjective: dog-strong', 'dog', 'strong', 'dog', False, False, False),
    (100, 'predicate-actor', 'predicate-actor: come-dog', 'dog', 'come', 'come', False, False, False),
    (100, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    # 101: 'The dog who chased and caught the cat was tired.' — relative
    # verb conjunction: the object belongs to the LAST conjunct only,
    # the subject distributes certain (ref tests/en/test_semantics_EN.py:216-224)
    (101, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (101, 'predicate-patient', 'predicate-patient: catch-cat', 'catch', 'cat', 'catch', False, False, False),
    (101, 'governor-adjective', 'governor-adjective: dog-tire', 'dog', 'tire', 'dog', False, False, False),
    (101, 'predicate-actor', 'predicate-actor: catch-dog', 'dog', 'catch', 'catch', False, False, False),
    # 102: 'The cat and the mouse that the dog chased were tired.' —
    # conjoined antecedents: first certain, later uncertain (ref
    # tests/en/test_semantics_EN.py:281-286); predicative amod reaches
    # both conjuncts
    (102, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (102, 'predicate-patient', 'predicate-patient: chase-mouse', 'chase', 'mouse', 'chase', False, True, False),
    (102, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (102, 'governor-adjective', 'governor-adjective: cat-tire', 'cat', 'tire', 'cat', False, False, False),
    (102, 'governor-adjective', 'governor-adjective: mouse-tire', 'mouse', 'tire', 'mouse', False, False, False),
    # 103: 'The dog was thinking about chasing a cat.' — prepositional
    # complement: the matrix subject is the gerund's uncertain subject
    # (ref tests/en/test_semantics_EN.py:518-521)
    (103, 'predicate-actor', 'predicate-actor: think-dog', 'dog', 'think', 'think', False, False, False),
    (103, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, True, False),
    (103, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    # 104: 'Somebody talked about the cat chased by the dog.' — reduced
    # passive relative: the modified noun is the participle's object,
    # the by-phrase its actor (ref tests/en/test_semantics_EN.py:487-491)
    (104, 'prepgovernor-noun', 'prepgovernor-noun: talk-cat', 'talk', 'cat', 'talk', False, False, False),
    (104, 'prep-noun', 'prep-noun: about-cat', 'about', 'cat', 'about', False, False, False),
    (104, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (104, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    # 105: 'The dog should chase the cat.' — modal verbs make the
    # predicate's deps uncertain (ref tests/en/test_semantics_EN.py:438-441)
    (105, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, True, False),
    (105, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, True, False),
    (106, 'verb-acc', 'verb-acc: jagd-katz', 'jagd', 'katz', 'jagd', False, False, False),
    (106, 'verb-nom', 'verb-nom: jagd-hund', 'hund', 'jagd', 'jagd', False, False, False),
    (107, 'intcompound', 'intcompound: information-polizei', 'information', 'polizei', 'information', False, False, False),
    (107, 'prep-noun', 'prep-noun: über-kriminell', 'über', 'kriminell', 'über', False, False, False),
    (107, 'prepgovernor-noun', 'prepgovernor-noun: information-kriminell', 'information', 'kriminell', 'information', False, False, False),
    (107, 'prepgovernor-noun', 'prepgovernor-noun: polizeiinformation-kriminell', 'polizeiinformation', 'kriminell', 'polizeiinformation', False, False, False),
    (108, 'noun-dependent', 'noun-dependent: mann-reich', 'mann', 'reich', 'mann', False, False, False),
    (108, 'prep-noun', 'prep-noun: nach-haus', 'nach', 'haus', 'nach', False, False, False),
    (108, 'prepgovernor-noun', 'prepgovernor-noun: kommen-haus', 'kommen', 'haus', 'kommen', False, False, False),
    (108, 'verb-nom', 'verb-nom: kommen-mann', 'mann', 'kommen', 'kommen', False, False, False),
    (109, 'verb-acc', 'verb-acc: jagd-katz', 'jagd', 'katz', 'jagd', False, False, False),
    (109, 'verb-nom', 'verb-nom: jagd-hund', 'hund', 'jagd', 'jagd', False, False, False),
    (110, 'verb-acc', 'verb-acc: jagd-katz', 'jagd', 'katz', 'jagd', True, False, False),
    (110, 'verb-nom', 'verb-nom: jagd-hund', 'hund', 'jagd', 'jagd', True, False, False),
    # 111: 'Der Hund jagte die Katze und die Maus.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (111, 'verb-acc', 'verb-acc: jagd-katz', 'jagd', 'katz', 'jagd', False, False, False),
    (111, 'verb-acc', 'verb-acc: jagd-maus', 'jagd', 'maus', 'jagd', False, False, False),
    (111, 'verb-nom', 'verb-nom: jagd-hund', 'hund', 'jagd', 'jagd', False, False, False),
    # 112: 'Die Polizei jagte den Kriminellen.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (112, 'verb-acc', 'verb-acc: jagd-kriminell', 'jagd', 'kriminell', 'jagd', False, False, False),
    (112, 'verb-nom', 'verb-nom: jagd-polizei', 'polizei', 'jagd', 'jagd', False, False, False),
    # 113: 'Die Katze wurde nicht gejagt.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (113, 'verb-acc', 'verb-acc: jagd-katz', 'jagd', 'katz', 'jagd', True, False, False),
    # 114: 'Der kleine Hund sah die Katze.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (114, 'noun-dependent', 'noun-dependent: hund-klein', 'hund', 'klein', 'hund', False, False, False),
    (114, 'verb-acc', 'verb-acc: sehen-katz', 'sehen', 'katz', 'sehen', False, False, False),
    (114, 'verb-nom', 'verb-nom: sehen-hund', 'hund', 'sehen', 'sehen', False, False, False),
    # 115: 'Die Wohnungsgesellschaft verkaufte das Haus.' — ref de templates de/language_specific_rules.py:1697-1960 + subword walk (head-subword variant per tests/de/test_phraselet_production_DE.py:112-135)
    (115, 'intcompound', 'intcompound: gesellschaft-wohnen', 'gesellschaft', 'wohnen', 'gesellschaft', False, False, False),
    (115, 'verb-acc', 'verb-acc: verkauf-haus', 'verkauf', 'haus', 'verkauf', False, False, False),
    (115, 'verb-nom', 'verb-nom: verkauf-gesellschaft', 'gesellschaft', 'verkauf', 'verkauf', False, False, False),
    (115, 'verb-nom', 'verb-nom: verkauf-wohnungsgesellschaft', 'wohnungsgesellschaft', 'verkauf', 'verkauf', False, False, False),
    # 116: 'Das Kind öffnete die Tür.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (116, 'verb-acc', 'verb-acc: öffnen-tür', 'öffnen', 'tür', 'öffnen', False, False, False),
    (116, 'verb-nom', 'verb-nom: öffnen-kind', 'kind', 'öffnen', 'öffnen', False, False, False),
    # 117: 'Der reiche Mann kaufte ein Auto.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (117, 'noun-dependent', 'noun-dependent: mann-reich', 'mann', 'reich', 'mann', False, False, False),
    (117, 'verb-acc', 'verb-acc: kauf-auto', 'kauf', 'auto', 'kauf', False, False, False),
    (117, 'verb-nom', 'verb-nom: kauf-mann', 'mann', 'kauf', 'kauf', False, False, False),
    # 118: 'Die Versicherungsgesellschaft informierte den Mann.' — ref de derivation.csv:201 (information,informieren)
    (118, 'intcompound', 'intcompound: gesellschaft-versichern', 'gesellschaft', 'versichern', 'gesellschaft', False, False, False),
    (118, 'verb-acc', 'verb-acc: information-mann', 'information', 'mann', 'information', False, False, False),
    (118, 'verb-nom', 'verb-nom: information-gesellschaft', 'gesellschaft', 'information', 'information', False, False, False),
    (118, 'verb-nom', 'verb-nom: information-versicherungsgesellschaft', 'versicherungsgesellschaft', 'information', 'information', False, False, False),
    # 119: 'Der Mann sah den Hund im Garten.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (119, 'prep-noun', 'prep-noun: in-garten', 'in', 'garten', 'in', False, False, False),
    (119, 'prepgovernor-noun', 'prepgovernor-noun: hund-garten', 'hund', 'garten', 'hund', False, True, False),
    (119, 'prepgovernor-noun', 'prepgovernor-noun: sehen-garten', 'sehen', 'garten', 'sehen', False, False, False),
    (119, 'verb-acc', 'verb-acc: sehen-hund', 'sehen', 'hund', 'sehen', False, False, False),
    (119, 'verb-nom', 'verb-nom: sehen-mann', 'mann', 'sehen', 'sehen', False, False, False),
    # 120: 'Die Frau las ein Buch.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (120, 'verb-acc', 'verb-acc: lesen-buch', 'lesen', 'buch', 'lesen', False, False, False),
    (120, 'verb-nom', 'verb-nom: lesen-frau', 'frau', 'lesen', 'lesen', False, False, False),
    # 121: 'Die Kinder spielten im Garten.' — ref derived from the DE template rules (de language_specific_rules.py:1697-1960) + de derivation.csv
    (121, 'prep-noun', 'prep-noun: in-garten', 'in', 'garten', 'in', False, False, False),
    (121, 'prepgovernor-noun', 'prepgovernor-noun: spiel-garten', 'spiel', 'garten', 'spiel', False, False, False),
    (121, 'verb-nom', 'verb-nom: spiel-kind', 'kind', 'spiel', 'spiel', False, False, False),
    # 122: 'Die Polizeiinformationsbroschüre ist interessant.' — 3-part
    # recursive compound split with penalty scoring (reference
    # de/language_specific_rules.py:364-530); adjacent parts chain via
    # intcompound (:740-746); predicative adjective → noun-dependent on
    # both the whole compound and its head subword
    (122, 'noun-dependent', 'noun-dependent: polizeiinformationsbroschür-interessant', 'polizeiinformationsbroschür', 'interessant', 'polizeiinformationsbroschür', False, False, False),
    (122, 'noun-dependent', 'noun-dependent: broschür-interessant', 'broschür', 'interessant', 'broschür', False, False, False),
    (122, 'intcompound', 'intcompound: information-polizei', 'information', 'polizei', 'information', False, False, False),
    (122, 'intcompound', 'intcompound: broschür-information', 'broschür', 'information', 'broschür', False, False, False),
    # sb under VAFIN 'ist' produces verb-nom like EN's predicate-actor:
    # be-man on snippet 8 (reference DE verb-nom parent tags include
    # VAFIN, de rules :1697-1724; + the head-subword child variant)
    (122, 'verb-nom', 'verb-nom: sein-polizeiinformationsbroschür', 'polizeiinformationsbroschür', 'sein', 'sein', False, False, False),
    (122, 'verb-nom', 'verb-nom: sein-broschür', 'broschür', 'sein', 'sein', False, False, False),
    # 91: 'The big cat creature chased the kitten.' — ontology-defined
    # multiword 'cat creature' indexed as one repr (reference
    # word_matching/ontology.py:180-210 + test ontology; multiword
    # substitution as in tests/en/test_phraselet_production_EN.py:160-163)
    (91, 'governor-adjective', 'governor-adjective: cat creature-big', 'cat creature', 'big', 'cat creature', False, False, False),
    (91, 'predicate-actor', 'predicate-actor: chase-cat creature', 'cat creature', 'chase', 'chase', False, False, False),
    (91, 'predicate-patient', 'predicate-patient: chase-kitten', 'chase', 'kitten', 'chase', False, False, False),
    # 92: 'I saw a dog. It barked. It was hungry.' — multi-sentence
    # coreference chain with relay through a resolved mention (reference
    # chains with 3-mention/300-word caps, parsing.py:1096-1137 + en
    # rules :92-96; coref-linked parent AND child deps, :1507-1532;
    # 'hungry' derives to 'hunger' via the transcribed derivation table)
    (92, 'predicate-patient', 'predicate-patient: see-dog', 'see', 'dog', 'see', False, False, False),
    (92, 'predicate-actor', 'predicate-actor: bark-dog', 'dog', 'bark', 'bark', False, False, True),
    (92, 'governor-adjective', 'governor-adjective: dog-hunger', 'dog', 'hunger', 'dog', False, False, True),
    # 93: 'The tired dog slept.' — adjective participle relemmatization
    # (tired→tire, reference holmes_lemma ADJ path :487-492)
    (93, 'governor-adjective', 'governor-adjective: dog-tire', 'dog', 'tire', 'dog', False, False, False),
    (93, 'predicate-actor', 'predicate-actor: sleep-dog', 'dog', 'sleep', 'sleep', False, False, False),
    # 94: 'The man whose dog chased the cat came home.' — whose-clause
    # (reference relative constructions, en language_specific_rules.py:
    # 287-476: the whose-NP is the clause subject and is possessed by
    # the antecedent → word-ofword via poss)
    (94, 'predicate-actor', 'predicate-actor: come-man', 'man', 'come', 'come', False, False, False),
    (94, 'word-ofword', 'word-ofword: dog-man', 'dog', 'man', 'dog', False, False, False),
    (94, 'predicate-actor', 'predicate-actor: chase-dog', 'dog', 'chase', 'chase', False, False, False),
    (94, 'predicate-patient', 'predicate-patient: chase-cat', 'chase', 'cat', 'chase', False, False, False),
    (94, 'governor-adjective', 'governor-adjective: come-home', 'come', 'home', 'come', False, False, False),
    # 123: 'Die Frau gab dem Mann das Buch.' — German double object:
    # the reference's verb-dat pattern 'verb-dat: gabe-frau' for datives
    # (tests/de/test_phraselet_production_DE.py:85-110; geben→gabe per
    # de derivation.csv)
    (123, 'verb-nom', 'verb-nom: gabe-frau', 'frau', 'gabe', 'gabe', False, False, False),
    (123, 'verb-dat', 'verb-dat: gabe-mann', 'gabe', 'mann', 'gabe', False, False, False),
    (123, 'verb-acc', 'verb-acc: gabe-buch', 'gabe', 'buch', 'gabe', False, False, False),
    # 124: 'Der Mann wurde vom Kriminellen gesehen.' — de passive+agent
    (124, 'verb-acc', 'verb-acc: sehen-mann', 'sehen', 'mann', 'sehen', False, False, False),
    (124, 'verb-nom', 'verb-nom: sehen-kriminell', 'kriminell', 'sehen', 'sehen', False, False, False),
    # 125: 'Die kleine Katze schlief im Garten.' (schlafen→schlaf)
    (125, 'noun-dependent', 'noun-dependent: katz-klein', 'katz', 'klein', 'katz', False, False, False),
    (125, 'verb-nom', 'verb-nom: schlaf-katz', 'katz', 'schlaf', 'schlaf', False, False, False),
    (125, 'prepgovernor-noun', 'prepgovernor-noun: schlaf-garten', 'schlaf', 'garten', 'schlaf', False, False, False),
    (125, 'prep-noun', 'prep-noun: in-garten', 'in', 'garten', 'in', False, False, False),
    # 126: 'Der Lehrer baute ein Haus.' (bauen→bau)
    (126, 'verb-nom', 'verb-nom: bau-lehrer', 'lehrer', 'bau', 'bau', False, False, False),
    (126, 'verb-acc', 'verb-acc: bau-haus', 'bau', 'haus', 'bau', False, False, False),
    # 127: 'Der Hund und der Löwe jagten die Katze.' — German subject
    # conjunction (ref tests/de/test_semantics_DE.py:25-30, plural
    # finite verb); jagen→jagd per de derivation.csv
    (127, 'verb-nom', 'verb-nom: jagd-hund', 'hund', 'jagd', 'jagd', False, False, False),
    (127, 'verb-acc', 'verb-acc: jagd-katz', 'jagd', 'katz', 'jagd', False, False, False),
    (127, 'verb-nom', 'verb-nom: jagd-löw', 'löw', 'jagd', 'jagd', False, False, False),
    # 128: 'Der große und starke Hund kam heim.' — conjoined attributive
    # adjectives (ref tests/de/test_semantics_DE.py:59-64); heim adverb →
    # verb-adverb template (de language_specific_rules.py:1697-1960)
    (128, 'noun-dependent', 'noun-dependent: hund-groß', 'hund', 'groß', 'hund', False, False, False),
    (128, 'noun-dependent', 'noun-dependent: hund-stark', 'hund', 'stark', 'hund', False, False, False),
    (128, 'verb-nom', 'verb-nom: kommen-hund', 'hund', 'kommen', 'kommen', False, False, False),
    (128, 'verb-adverb', 'verb-adverb: kommen-heim', 'kommen', 'heim', 'kommen', False, False, False),
]

# (snip_id, word) — child-pole words that are GENDERED per the
# reference's who-question gate (en language_specific_rules.py:
# 1338-1363): PERSON/NORP/ORG/GPE entity, morph-gendered noun
# (GENDERED_NOUNS_EN), or a gendered pronoun in the word's coreference
# chain within the snippet; DE gates on PERSON_NOUNS_DE. Verified
# per-snippet the same way as GOLDEN_EDGES ('manager' in snippet 48 is
# a person noun but NOT gendered — it does not answer 'who').
GOLDEN_GENDERED: list[tuple] = [
    (5, 'richard paul hudson'), (8, 'man'), (9, 'man'), (11, 'man'),
    (13, 'man'), (15, 'man'), (17, 'man'), (18, 'man'), (27, 'man'),
    (36, 'man'), (38, 'richard paul hudson'), (39, 'mary'),
    (40, 'king'), (43, 'man'), (44, 'woman'), (45, 'man'),
    (45, 'woman'), (58, 'king'), (61, 'boy'), (62, 'woman'),
    (66, 'man'), (67, 'woman'), (70, 'girl'), (75, 'king'),
    (77, 'king'), (80, 'man'), (81, 'boy'), (82, 'girl'),
    (83, 'woman'), (84, 'man'), (87, 'man'), (89, 'john'),
    (90, 'girl'), (94, 'man'), (107, 'kriminell'), (108, 'mann'),
    (112, 'kriminell'), (116, 'kind'), (117, 'mann'), (118, 'mann'),
    (119, 'mann'), (120, 'frau'), (121, 'kind'), (123, 'frau'),
    (123, 'mann'), (124, 'kriminell'), (124, 'mann'), (126, 'lehrer'),
]

# (snip_id, template, pred, wh_word) — CORPUS-side literal question
# words: a document's own interrogative in an answering dependency.
# A query question phraselet whose predicate matches scores these as
# plain RELATIONS (never answers) — the reference keeps relation_score
# when the matched document token carries an interrogative tag
# (topic_matching.py:965-975; tests/en/test_questions_EN.py:392-396).
GOLDEN_QWORD_EDGES: list[tuple] = [
    (14, 'head-WHsubj', 'come', 'who'),     # 'Who came?'
    (29, 'head-WHsubj', 'open', 'who'),     # 'Who opened the door?'
    # relative-pronoun 'who' snippets (15, 96, 101) also carry literal
    # interrogatives, but no driver query's question phraselet shares
    # their clause predicate, so they are not recorded here
]

# (snip_id, word) — the reference's single-word phraselets
GOLDEN_WORDS_ANY: list[tuple] = [
    (0, 'chase'),
    (1, 'be'), (1, 'chase'),
    (2, 'do'), (2, 'chase'),
    (3, 'chase'),
    (4, 'see'), (4, 'be'), (4, 'chase'),
    (5, 'come'), (5, 'home'),
    (6, 'grow'),
    (7, 'grow up'), (7, 'quick'),
    (8, 'be'), (8, 'poor'),
    (9, 'rich'), (9, 'come'), (9, 'home'),
    (10, 'gift'),
    (11, 'chase'),
    (12, 'three'), (12, 'chase'),
    (13, 'sing'), (13, 'in'),
    (14, 'come'),
    (15, 'chase'), (15, 'come'), (15, 'home'),
    (16, 'chase'), (16, 'be'), (16, 'old'),
    (17, 'decide'), (17, 'open'),
    (18, 'see'), (18, 'in'),
    (19, 'be'), (19, 'hard'), (19, 'book'),
    (20, 'be'), (20, 'grow'),
    (21, 'sail'), (21, 'rapid'),
    (22, 'grow'),
    (23, 'grow'),
    (24, 'healthy'), (24, 'grow'), (24, 'in'),
    (25, 'healthy'), (25, 'grow'),
    (26, 'progress'), (26, 'with'),
    (27, 'need'), (27, 'for'), (27, 'five'),
    (28, 'gift'),
    (29, 'open'),
    (30, 'will'), (30, 'chase'),
    (31, 'never'), (31, 'chase'),
    (32, 'chase'),
    (33, 'chase'),
    (34, 'chase'),
    (35, 'chase'),
    (36, 'open'),
    (37, 'need'),
    (38, 'open'),
    (39, 'come'), (39, 'home'),
    (40, 'old'), (40, 'come'), (40, 'home'),
    (41, 'be'), (41, 'chase'),
    (42, 'three'), (42, 'chase'), (42, 'two'),
    (43, 'decide'), (43, 'buy'),
    (44, 'try'), (44, 'open'),
    (45, 'see'), (45, 'in'),
    (46, 'see'), (46, 'be'), (46, 'chase'),
    (47, 'be'), (47, 'ease'), (47, 'book'),
    (48, 'be'), (48, 'open'),
    (49, 'be'), (49, 'extract'),
    (50, 'be'), (50, 'build'), (50, 'quick'),
    (51, 'find'), (51, 'in'),
    (52, 'write'),
    (53, 'chase'),
    (54, 'plant'),
    (55, 'eat'),
    (56, 'read'),
    (57, 'help'),
    (58, 'buy'),
    (59, 'watch'),
    (60, 'catch'),
    (61, 'break'),
    (62, 'sell'),
    (63, 'explain'),
    (64, 'throw'),
    (65, 'eat'),
    (66, 'rich'), (66, 'sing'), (66, 'quick'),
    (67, 'sick'), (67, 'sleep'),
    (68, 'famous'), (68, 'visit'),
    (69, 'repair'),
    (70, 'paint'),
    (71, 'steal'),
    (72, 'deliver'),
    (73, 'sink'), (73, 'in'),
    (74, 'approach'),
    (75, 'buy'),
    (76, 'wash'),
    (77, 'sing'), (77, 'in'),
    (78, 'visit'), (78, 'sick'),
    (79, 'gentle'), (79, 'help'),
    (80, 'open'),
    (81, 'do'), (81, 'break'),
    (82, 'never'), (82, 'visit'),
    (83, 'old'), (83, 'feed'),
    (84, 'strong'), (84, 'carry'),
    (85, 'small'), (85, 'bark'),
    (86, 'tire'), (86, 'sleep'), (86, 'in'),
    (87, 'open'),
    (88, 'two'), (88, 'fly'), (88, 'over'),
    (89, 'come'), (89, 'home'),
    (90, 'happy'), (90, 'sing'),
    (91, 'big'), (91, 'chase'),
    (92, 'see'), (92, 'bark'), (92, 'be'), (92, 'hunger'),
    (93, 'tire'), (93, 'sleep'),
    (94, 'chase'), (94, 'come'), (94, 'home'),
    (95, 'chase'), (95, 'be'), (95, 'tire'),
    (96, 'chase'), (96, 'tell'),
    (97, 'chase'),
    (98, 'order'), (98, 'chase'),
    (99, 'decide'), (99, 'be'), (99, 'chase'),
    (100, 'large'), (100, 'strong'), (100, 'come'), (100, 'home'),
    (101, 'chase'), (101, 'catch'), (101, 'be'), (101, 'tire'),
    (102, 'chase'), (102, 'be'), (102, 'tire'),
    (103, 'be'), (103, 'think'), (103, 'about'), (103, 'chase'),
    (104, 'talk'), (104, 'about'), (104, 'chase'),
    (105, 'should'), (105, 'chase'),
    (106, 'jagd'),
    (107, 'polizei'), (107, 'information'), (107, 'über'),
    (108, 'reich'), (108, 'kommen'), (108, 'nach'),
    (109, 'werden'), (109, 'jagd'),
    (110, 'jagd'),
    (111, 'jagd'),
    (112, 'jagd'),
    (113, 'werden'), (113, 'jagd'),
    (114, 'klein'), (114, 'sehen'),
    (115, 'wohnen'), (115, 'gesellschaft'), (115, 'verkauf'),
    (116, 'öffnen'),
    (117, 'reich'), (117, 'kauf'),
    (118, 'versichern'), (118, 'gesellschaft'), (118, 'information'),
    (119, 'sehen'), (119, 'in'),
    (120, 'lesen'),
    (121, 'spiel'), (121, 'in'),
    (122, 'polizei'), (122, 'information'), (122, 'broschür'), (122, 'sein'), (122, 'interessant'),
    (123, 'gabe'),
    (124, 'werden'), (124, 'sehen'),
    (125, 'klein'), (125, 'schlaf'), (125, 'in'),
    (126, 'bau'),
    (127, 'jagd'),
    (128, 'groß'), (128, 'stark'), (128, 'kommen'), (128, 'heim'),
]

# Any-tag single-word phraselets per snippet: matchable non-noun tokens
# admitted by the reference's all-words production pass
# (parsing.py:2442-2457 match_all_words=True; matchable_pos incl. VERB/
# ADJ/ADV/ADP, en language_specific_rules.py:25-36; stop lemmas
# then/therefore/so and PRP tags excluded, :830/:847). Derived lemmas
# follow the transcribed derivation rules.
GOLDEN_WORDS: list[tuple] = [
    (123, 'frau'), (123, 'mann'), (123, 'buch'),
    (124, 'mann'), (124, 'kriminell'),
    (125, 'katz'), (125, 'garten'),
    (126, 'lehrer'), (126, 'haus'),
    (127, 'hund'), (127, 'löw'), (127, 'katz'),
    (128, 'hund'),
    (94, 'man'),
    (94, 'dog'),
    (94, 'cat'),
    (93, 'dog'),
    (92, 'dog'),
    (91, 'cat creature'),
    (91, 'kitten'),
    (122, 'polizeiinformationsbroschür'),
    (21, 'sailor'),
    (27, 'man'),
    (0, 'cat'),
    (0, 'dog'),
    (1, 'cat'),
    (1, 'dog'),
    (2, 'cat'),
    (2, 'dog'),
    (3, 'cat'),
    (3, 'dog'),
    (4, 'cat'),
    (4, 'dog'),
    (5, 'richard paul hudson'),
    (6, 'plant'),
    (7, 'plant'),
    (8, 'man'),
    (9, 'man'),
    (10, 'employee'),
    (10, 'file'),
    (11, 'cat'),
    (11, 'dog'),
    (11, 'man'),
    (12, 'cat'),
    (12, 'dog'),
    (13, 'garden'),
    (13, 'man'),
    (15, 'cat'),
    (15, 'man'),
    (16, 'cat'),
    (16, 'dog'),
    (17, 'account'),
    (17, 'man'),
    (18, 'dog'),
    (18, 'garden'),
    (18, 'man'),
    (19, 'holiday'),
    (20, 'plant'),
    (22, 'hobby'),
    (22, 'plant'),
    (23, 'gardener'),
    (23, 'plant'),
    (24, 'gardener'),
    (24, 'hobby'),
    (24, 'plant'),
    (24, 'sun'),
    (25, 'plant'),
    (26, 'extract'),
    (26, 'inform'),
    (27, 'insurance'),
    (27, 'year'),
    (28, 'plant'),
    (29, 'door'),
    (30, 'cat'),
    (30, 'dog'),
    (31, 'cat'),
    (31, 'dog'),
    (32, 'cat'),
    (32, 'dog'),
    (32, 'lion'),
    (33, 'cat'),
    (33, 'dog'),
    (33, 'mouse'),
    (34, 'lion'),
    (34, 'mouse'),
    (35, 'hound'),
    (35, 'kitten'),
    (36, 'account'),
    (36, 'man'),
    (37, 'employee'),
    (37, 'insurance'),
    (38, 'account'),
    (38, 'richard paul hudson'),
    (39, 'mary'),
    (40, 'king'),
    (41, 'dog'),
    (41, 'lion'),
    (42, 'lion'),
    (42, 'mouse'),
    (43, 'house'),
    (43, 'man'),
    (44, 'door'),
    (44, 'woman'),
    (45, 'house'),
    (45, 'man'),
    (45, 'woman'),
    (46, 'cat'),
    (46, 'dog'),
    (47, 'holiday'),
    (48, 'account'),
    (48, 'manager'),
    (49, 'inform'),
    (50, 'house'),
    (51, 'child'),
    (51, 'dog'),
    (51, 'garden'),
    (52, 'author'),
    (52, 'book'),
    (53, 'cat'),
    (53, 'dog'),
    (54, 'farmer'),
    (54, 'tree'),
    (55, 'bird'),
    (55, 'food'),
    (56, 'book'),
    (56, 'student'),
    (57, 'child'),
    (57, 'doctor'),
    (58, 'horse'),
    (58, 'king'),
    (59, 'child'),
    (59, 'nurse'),
    (60, 'fox'),
    (60, 'hunter'),
    (61, 'boy'),
    (61, 'window'),
    (62, 'car'),
    (62, 'woman'),
    (63, 'lesson'),
    (63, 'teacher'),
    (64, 'ball'),
    (64, 'child'),
    (65, 'cat'),
    (65, 'mouse'),
    (66, 'man'),
    (67, 'woman'),
    (68, 'author'),
    (68, 'village'),
    (69, 'bridge'),
    (69, 'worker'),
    (70, 'girl'),
    (70, 'picture'),
    (71, 'car'),
    (71, 'criminal'),
    (72, 'employee'),
    (72, 'letter'),
    (72, 'manager'),
    (73, 'sea'),
    (73, 'ship'),
    (74, 'boat'),
    (74, 'bridge'),
    (75, 'castle'),
    (75, 'horse'),
    (75, 'king'),
    (76, 'cook'),
    (76, 'dish'),
    (77, 'castle'),
    (77, 'king'),
    (78, 'child'),
    (78, 'doctor'),
    (79, 'student'),
    (79, 'teacher'),
    (80, 'door'),
    (80, 'man'),
    (81, 'boy'),
    (81, 'window'),
    (82, 'castle'),
    (82, 'girl'),
    (83, 'bird'),
    (83, 'woman'),
    (84, 'man'),
    (84, 'table'),
    (85, 'dog'),
    (86, 'child'),
    (86, 'house'),
    (87, 'door'),
    (87, 'house'),
    (87, 'man'),
    (88, 'bird'),
    (88, 'river'),
    (89, 'john'),
    (90, 'girl'),
    (90, 'song'),
    # 95-102: new-construction snippets (see GOLDEN_EDGES provenance)
    (95, 'cat'), (95, 'dog'),
    (96, 'dog'), (96, 'cat'),
    (97, 'dog'), (97, 'wolf'), (97, 'hound'), (97, 'cat'),
    (98, 'mouse'), (98, 'dog'), (98, 'cat'),
    (99, 'dog'),
    (100, 'dog'),
    (101, 'dog'), (101, 'cat'),
    (102, 'cat'), (102, 'mouse'), (102, 'dog'),
    (103, 'dog'), (103, 'cat'),
    (104, 'cat'), (104, 'dog'),
    (105, 'dog'), (105, 'cat'),
    (106, 'hund'),
    (106, 'katz'),
    (107, 'kriminell'),
    (107, 'polizeiinformation'),
    (108, 'haus'),
    (108, 'mann'),
    (109, 'hund'),
    (109, 'katz'),
    (110, 'hund'),
    (110, 'katz'),
    (111, 'hund'),
    (111, 'katz'),
    (111, 'maus'),
    (112, 'kriminell'),
    (112, 'polizei'),
    (113, 'katz'),
    (114, 'hund'),
    (114, 'katz'),
    (115, 'haus'),
    (115, 'wohnungsgesellschaft'),
    (116, 'kind'),
    (116, 'tür'),
    (117, 'auto'),
    (117, 'mann'),
    (118, 'mann'),
    (118, 'versicherungsgesellschaft'),
    (119, 'garten'),
    (119, 'hund'),
    (119, 'mann'),
    (120, 'buch'),
    (120, 'frau'),
    (121, 'garten'),
    (121, 'kind'),
]

# per-snippet structural-match annotations (snip_id, negated, involves_coref);
# match-level negation ORs over matched doc tokens (reference
# structural_matching.py:381-465)
MATCH_DOG_CHASES_CAT: list[tuple] = [(0, 0, 0), (1, 0, 0), (2, 1, 0), (3, 1, 0), (4, 0, 1), (11, 0, 0), (12, 0, 0), (16, 0, 0), (30, 0, 0), (31, 1, 0), (32, 0, 0), (33, 0, 0), (46, 0, 1), (53, 0, 0), (94, 0, 0), (95, 0, 0), (96, 0, 0), (97, 0, 0), (98, 0, 0), (102, 0, 0), (103, 0, 0), (104, 0, 0), (105, 0, 0)]

MATCH_ANIMAL_CHASES_ANIMAL: list[tuple] = [(0, 0, 0), (1, 0, 0), (2, 1, 0), (3, 1, 0), (4, 0, 1), (11, 0, 0), (12, 0, 0), (16, 0, 0), (30, 0, 0), (31, 1, 0), (32, 0, 0), (33, 0, 0), (35, 0, 0), (46, 0, 1), (53, 0, 0), (91, 0, 0), (94, 0, 0), (95, 0, 0), (96, 0, 0), (97, 0, 0), (98, 0, 0), (102, 0, 0), (103, 0, 0), (104, 0, 0), (105, 0, 0), (106, 0, 0), (127, 0, 0), (109, 0, 0), (110, 1, 0), (111, 0, 0)]

MATCH_PERSON_COMES_HOME: list[tuple] = [(5, 0, 0), (39, 0, 0), (89, 0, 0)]

# (snip_id, answer) for the question query 'Who came?'
QUESTION_ANSWERS: list[tuple] = [(5, 'richard paul hudson'), (39, 'mary'), (89, 'john')]


# deterministic word-vector fixture for embedding-based matching (the
# reference reads vectors off the spaCy model; we broadcast a table).
# Designed geometry: wolf≈dog≈hound, kitten≈cat, pursue≈chase.
WORD_VECTORS: dict[str, list[float]] = {
    "dog":    [1.00, 0.10, 0.00, 0.00],
    "wolf":   [0.95, 0.15, 0.05, 0.00],
    "hound":  [0.90, 0.20, 0.00, 0.10],
    "cat":    [0.05, 1.00, 0.10, 0.00],
    "kitten": [0.10, 0.95, 0.15, 0.00],
    "chase":  [0.00, 0.05, 1.00, 0.10],
    "pursue": [0.05, 0.00, 0.98, 0.12],
    "man":    [0.00, 0.00, 0.10, 1.00],
    "plant":  [0.30, 0.30, 0.30, 0.30],
    # entity-label prototype lexemes (reference maps entity labels to
    # lexeme vectors, en language_specific_rules.py:100-121)
    "person": [0.00, 0.05, 0.12, 0.98],
    "place":  [0.55, 0.55, 0.05, 0.15],
    # roof≈house at cosine exactly 0.58 — the reference's
    # reverse-only-parent embedding-retry scores (47 / 58, reference
    # tests/en/test_topic_matching_EN.py:245,253) pin the real-model
    # cosine into [0.5323, 0.6163); any value in that band reproduces
    # both integers through 0.6·√sim relation deflation. Negative
    # components keep these two below every other fixture threshold.
    "roof":   [0.00, 0.00, 0.00, -1.00],
    "house":  [-0.8146, 0.00, 0.00, -0.58],
}

# deterministic German vector fixture (reference tests drive
# de_core_news_lg; the DE topic suite's embedding battery pins only
# the dach≈haus and könig≈präsident proximities — the same
# band-engineering as roof/house above, reference
# tests/de/test_topic_matching_DE.py:53-124)
WORD_VECTORS_DE: dict[str, list[float]] = {
    # dach≈haus pinned at cosine 0.64: the reverse-only embedding
    # battery's integer scores (48 aux/verb twoway, 47 under an extra
    # auxiliary/modal, ref :53-91) hold for cosine in (0.621, 0.667)
    "dach":      [0.00, 0.00, 0.00, -1.00],
    "haus":      [-0.7684, 0.00, 0.00, -0.64],
    # könig≈präsident pinned at 0.48: reverse_matching_noun scores 48
    # (ref :113-115) for cosine in (0.45, 0.505)
    "könig":     [1.00, 0.00, 0.00, 0.00],
    "präsident": [0.48, 0.8773, 0.00, 0.00],
    # könig≈prinz for the subword embedding case (ref :257-266)
    "prinz":     [0.70, 0.00, 0.7141, 0.00],
}

MAX_SNIPS = 5
URL_PREFIX = "https://example.org/doc-"
HTML_PREFIX = "<html><body><p>"
HTML_SUFFIX = "</p></body></html>"


# --------------------------------------------------------- Spark side

def _snip_expr(doc_id, j: int, en_pool, de_pool):
    # en_pool/de_pool are single ArrayType literals (F.lit(list)) built
    # once per pages frame: one Literal node each in the plan instead of
    # 129 string literals per use — cuts driver-side plan construction
    # and analysis from seconds to milliseconds (10 uses per frame)
    idx = (doc_id * 31 + F.lit(j) * 17)
    en = F.element_at(en_pool, ((idx % len(POOL_EN)) + 1).cast("int"))
    de = F.element_at(de_pool, ((idx % len(POOL_DE)) + 1).cast("int"))
    lang_is_de = (doc_id % 7) == 3
    snip = F.when(lang_is_de, de).otherwise(en)
    return F.when(F.lit(j) < 1 + (doc_id % 5), snip)


def build_pages(spark: SparkSession, sf_dir: str, n_pages: int | None = None) -> DataFrame:
    """Synthesize the `pages` corpus from documents.doc_id (pure
    column expressions — no Python rows, no RDDs; scales by reading an
    arbitrarily large seed table)."""
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if n_pages is not None:
        ids = ids.filter(F.col("doc_id") < n_pages)
    return _pages_from_ids(ids)


def build_pages_n(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Same corpus from spark.range — for benchmarks at arbitrary scale
    (doc_id = range id; identical arithmetic, still SQL-mirrorable)."""
    ids = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return _pages_from_ids(ids.select(F.col("id").alias("doc_id")))


def _pages_from_ids(ids: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    en_pool, de_pool = F.lit(list(POOL_EN)), F.lit(list(POOL_DE))
    text = F.concat_ws(" ", *[_snip_expr(doc_id, j, en_pool, de_pool)
                              for j in range(MAX_SNIPS)])
    return ids.select(
        doc_id.alias("page_id"),
        F.concat(F.lit(URL_PREFIX), doc_id.cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=doc_id.cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit(HTML_PREFIX), text, F.lit(HTML_SUFFIX)), "UTF-8").alias("html"),
        text.alias("text"),
        F.when((doc_id % 7) == 3, F.lit("de")).otherwise(F.lit("en")).alias("lang"),
    )


# -------------------------------------------------------- oracle side

def pages_cte_sql() -> str:
    """DuckDB CTEs mirroring build_pages: `page_snips(page_id, url,
    lang, j, snip_id)` + golden VALUES tables. Prepend to oracle SQL."""
    edges_vals = ",\n    ".join(
        f"({sid}, '{t}', '{lbl}', '{s}', '{o}', '{p}', {str(n).upper()}, {str(u).upper()}, {str(c).upper()})"
        for (sid, t, lbl, s, o, p, n, u, c) in GOLDEN_EDGES
    )
    words_vals = ",\n    ".join(f"({sid}, '{w}')" for (sid, w) in GOLDEN_WORDS)
    any_words_vals = ",\n    ".join(
        f"({sid}, '{w}')" for (sid, w) in GOLDEN_WORDS_ANY)
    gendered_vals = ",\n    ".join(
        f"({sid}, '{w}')" for (sid, w) in GOLDEN_GENDERED)
    qword_vals = ",\n    ".join(
        f"({sid}, '{t}', '{p}', '{w}')"
        for (sid, t, p, w) in GOLDEN_QWORD_EDGES)
    snips_vals = ",\n    ".join(
        f"({i}, '{s.replace(chr(39), chr(39)*2)}')" for i, s in enumerate(POOL)
    )
    return f"""
WITH RECURSIVE pages AS (
  SELECT doc_id AS page_id,
         '{URL_PREFIX}' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 7 = 3 THEN 'de' ELSE 'en' END AS lang
  FROM documents
),
js AS (SELECT unnest(range({MAX_SNIPS})) AS j),
page_snips AS (
  SELECT p.page_id, p.url, p.lang, js.j,
         CASE WHEN p.lang = 'de'
              THEN {len(POOL_EN)} + (p.page_id * 31 + js.j * 17) % {len(POOL_DE)}
              ELSE (p.page_id * 31 + js.j * 17) % {len(POOL_EN)} END AS snip_id
  FROM pages p CROSS JOIN js
  WHERE js.j < 1 + p.page_id % 5
),
snippets(snip_id, snip_text) AS (VALUES
    {snips_vals}
),
golden_edges(snip_id, template, label, subj, obj, pred, negated, uncertain, involves_coref) AS (VALUES
    {edges_vals}
),
golden_words(snip_id, word) AS (VALUES
    {words_vals}
),
golden_any_words(snip_id, word) AS (VALUES
    {any_words_vals}
),
golden_gendered(snip_id, word) AS (VALUES
    {gendered_vals}
),
golden_qword_edges(snip_id, template, pred, wh) AS (VALUES
    {qword_vals}
)
"""
