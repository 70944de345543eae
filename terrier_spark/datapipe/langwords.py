"""Function-word marker lexicons for language identification.

~100 high-frequency closed-class words (articles, prepositions,
pronouns, conjunctions, auxiliaries) per language — standard public
linguistic inventories, the same closed classes every stopword list
ships.  Larger lists make short / code-mixed documents classifiable
where a 10-word list sees zero hits.

Words are lowercase and apostrophe-free (the language-ID tokenizer
extracts letter runs, so elided forms like "l'homme" arrive as two
tokens).  The gate oracle SQL is GENERATED from this dict
(gate_datapipe._lang_sql), so the engine and oracle can never drift.
"""

from __future__ import annotations

FUNCTION_WORDS: dict = {
    "en": (
        "the", "be", "to", "of", "and", "in", "that", "have", "it",
        "for", "not", "on", "with", "he", "as", "you", "do", "at",
        "this", "but", "his", "by", "from", "they", "we", "say", "her",
        "she", "or", "an", "will", "my", "one", "all", "would", "there",
        "their", "what", "so", "up", "out", "if", "about", "who", "get",
        "which", "go", "me", "when", "make", "can", "like", "time",
        "no", "just", "him", "know", "take", "into", "your", "some",
        "could", "them", "see", "other", "than", "then", "now", "only",
        "come", "its", "over", "also", "after", "use", "two", "how",
        "our", "well", "way", "even", "new", "want", "because", "any",
        "these", "give", "day", "most", "us", "is", "was", "are",
        "were", "been", "has", "had", "did", "should", "may", "such",
    ),
    "es": (
        "el", "la", "de", "que", "y", "a", "en", "un", "ser", "se",
        "no", "haber", "por", "con", "su", "para", "como", "estar",
        "tener", "le", "lo", "todo", "pero", "más", "hacer", "o",
        "poder", "decir", "este", "ir", "otro", "ese", "si", "me",
        "ya", "ver", "porque", "dar", "cuando", "muy", "sin", "vez",
        "mucho", "saber", "qué", "sobre", "mi", "alguno", "mismo",
        "yo", "también", "hasta", "año", "dos", "querer", "entre",
        "así", "primero", "desde", "grande", "eso", "ni", "nos",
        "llegar", "pasar", "tiempo", "ella", "sí", "día", "uno",
        "bien", "poco", "deber", "entonces", "poner", "cosa", "tanto",
        "hombre", "parecer", "nuestro", "tan", "donde", "ahora",
        "parte", "después", "vida", "quedar", "siempre", "creer",
        "hablar", "llevar", "dejar", "nada", "cada", "seguir", "menos",
        "nuevo", "los", "las", "del", "al", "una", "es", "son", "fue",
        "está", "esta", "estos", "estas", "había", "tiene", "puede",
    ),
    "de": (
        "der", "die", "das", "und", "sein", "in", "ein", "zu", "haben",
        "ich", "werden", "sie", "von", "nicht", "mit", "es", "sich",
        "auch", "auf", "für", "an", "er", "so", "dass", "können",
        "dieser", "als", "ihr", "ja", "wie", "bei", "oder", "wir",
        "aber", "dann", "man", "da", "noch", "nach", "was", "also",
        "aus", "wenn", "nur", "müssen", "sagen", "um", "über",
        "machen", "kein", "jahr", "du", "mein", "schon", "vor",
        "durch", "geben", "mehr", "andere", "viel", "kommen", "jetzt",
        "sollen", "mir", "wollen", "ganz", "mich", "immer", "gehen",
        "sehr", "hier", "doch", "bis", "wieder", "mal", "zwei", "gut",
        "wissen", "neu", "sehen", "lassen", "uns", "weil", "unter",
        "denn", "stehen", "jede", "zeit", "erste", "ihm", "ihn", "wo",
        "lang", "damit", "selbst", "den", "dem", "des", "eine",
        "einen", "einem", "einer", "ist", "sind", "war", "hat",
        "wird", "zum", "zur", "im", "am", "vom", "keine", "diese",
    ),
    "fr": (
        "le", "la", "les", "de", "un", "une", "être", "et", "à", "il",
        "avoir", "ne", "je", "son", "que", "se", "qui", "ce", "dans",
        "en", "du", "elle", "au", "pour", "pas", "vous", "par", "sur",
        "faire", "plus", "dire", "me", "on", "mon", "lui", "nous",
        "comme", "mais", "pouvoir", "avec", "tout", "y", "aller",
        "voir", "bien", "où", "sans", "tu", "ou", "leur", "homme",
        "si", "deux", "moi", "vouloir", "te", "femme", "venir",
        "quand", "grand", "celui", "notre", "devoir", "là", "jour",
        "prendre", "même", "votre", "rien", "encore", "aussi",
        "quelque", "dont", "tous", "vie", "savoir", "autre", "après",
        "toujours", "cela", "aucun", "donner", "petit", "des", "est",
        "sont", "était", "été", "ont", "cette", "ces", "aux", "sa",
        "ses", "mes", "nos", "vos", "fait", "peut", "très",
    ),
    "it": (
        "il", "di", "che", "e", "la", "a", "per", "un", "in", "essere",
        "mi", "con", "non", "si", "ti", "lo", "le", "cosa", "se", "io",
        "avere", "ci", "questo", "qui", "hai", "bene", "del", "tu",
        "tutto", "lei", "della", "sono", "una", "gli", "fare", "no",
        "come", "ma", "dei", "sì", "stato", "potere", "suo", "al",
        "volere", "lui", "noi", "anche", "più", "da", "quando",
        "sapere", "ora", "dovere", "mio", "me", "solo", "vedere",
        "perché", "così", "due", "andare", "dire", "molto", "uno",
        "quello", "tempo", "nel", "nella", "alla", "loro", "prima",
        "dove", "casa", "ancora", "già", "senza", "sempre", "o", "i",
        "su", "tutti", "mai", "altro", "dopo", "vita", "via", "oggi",
        "niente", "allora", "ogni", "era", "ho", "ha", "hanno",
        "alle", "degli", "delle", "dal", "questa", "può",
    ),
    "pt": (
        "o", "a", "os", "as", "de", "que", "e", "do", "da", "em",
        "um", "para", "é", "com", "não", "uma", "no", "se", "na",
        "por", "mais", "dos", "como", "mas", "foi", "ao", "ele",
        "das", "tem", "à", "seu", "sua", "ou", "ser", "quando",
        "muito", "há", "nos", "já", "está", "eu", "também", "só",
        "pelo", "pela", "até", "isso", "ela", "entre", "era",
        "depois", "sem", "mesmo", "aos", "ter", "seus", "quem",
        "nas", "me", "esse", "eles", "estão", "você", "tinha",
        "foram", "essa", "num", "nem", "suas", "meu", "às", "minha",
        "têm", "numa", "pelos", "elas", "havia", "seja", "qual",
        "será", "nós", "tenho", "lhe", "deles", "essas", "esses",
        "pelas", "este", "fosse", "dele", "tu", "te", "vocês",
        "vos", "lhes", "meus", "minhas", "teu", "tua", "nosso",
    ),
    "nl": (
        "de", "het", "een", "van", "en", "in", "is", "dat", "op",
        "te", "zijn", "met", "voor", "niet", "aan", "er", "om",
        "ook", "als", "dan", "maar", "bij", "of", "uit", "nog",
        "naar", "heeft", "worden", "door", "over", "zo", "wordt",
        "wel", "geen", "kan", "tot", "hij", "moet", "wat", "ik",
        "je", "hem", "deze", "dit", "al", "meer", "onder", "hebben",
        "ze", "die", "was", "werd", "tussen", "na", "hun", "omdat",
        "nu", "af", "haar", "men", "toen", "had", "waren", "zich",
        "hier", "heb", "wie", "zij", "kunnen", "we", "alle", "mij",
        "veel", "ons", "gaan", "jaar", "zou", "tegen", "dus",
        "echter", "eerste", "laten", "mijn", "u", "doen", "nooit",
        "iets", "waar", "elkaar", "wil", "twee", "goed", "zelf",
        "alleen", "andere", "grote", "komen", "eigen", "moeten",
    ),
    "sv": (
        "och", "att", "det", "som", "en", "på", "är", "av", "för",
        "med", "till", "den", "har", "de", "inte", "om", "ett",
        "han", "men", "var", "jag", "sig", "från", "vi", "så",
        "kan", "man", "när", "år", "säger", "hon", "under", "också",
        "efter", "eller", "nu", "sin", "där", "vid", "mot", "ska",
        "skulle", "kommer", "ut", "får", "finns", "vara", "hade",
        "alla", "andra", "mycket", "än", "här", "då", "sedan",
        "över", "bara", "in", "blir", "upp", "även", "vad", "få",
        "två", "vill", "ner", "detta", "denna", "något", "några",
        "hur", "enligt", "bland", "genom", "per", "utan", "sina",
        "dem", "oss", "mellan", "dessa", "allt", "mer", "varit",
        "blev", "bli", "ha", "du", "din", "ditt", "era", "hans",
        "hennes", "deras", "vår", "min", "mitt", "ingen", "inga",
    ),
    "ru": (
        "и", "в", "не", "на", "я", "быть", "он", "с", "что", "а",
        "по", "это", "она", "этот", "к", "но", "они", "мы", "как",
        "из", "у", "который", "то", "за", "свой", "весь", "год",
        "от", "так", "о", "для", "ты", "же", "все", "тот", "мочь",
        "вы", "человек", "такой", "его", "сказать", "только", "или",
        "ещё", "бы", "себя", "один", "уже", "до", "время", "если",
        "сам", "когда", "другой", "вот", "говорить", "наш", "мой",
        "знать", "стать", "при", "чтобы", "дело", "жизнь", "кто",
        "первый", "очень", "два", "день", "её", "новый", "даже",
        "во", "со", "раз", "где", "там", "под", "можно", "ну",
        "какой", "после", "их", "работа", "без", "самый", "потом",
        "надо", "хотеть", "ли", "слово", "идти", "большой",
        "должен", "место", "иметь", "была", "были", "есть", "нет",
        "меня", "тебя", "него", "ней", "них", "нам", "вам",
    ),
    "tr": (
        "bir", "ve", "bu", "da", "de", "ne", "için", "ile", "mi",
        "ama", "çok", "ben", "o", "gibi", "daha", "kadar", "sen",
        "ki", "var", "her", "biz", "diye", "ise", "sonra", "en",
        "onun", "bana", "beni", "sana", "seni", "onu", "şey", "yok",
        "olarak", "olan", "bunu", "böyle", "nasıl", "şu", "siz",
        "zaman", "iki", "kendi", "başka", "mı", "mu", "mü", "değil",
        "hem", "hiç", "üzere", "bile", "eğer", "yani", "dedi",
        "oldu", "olur", "olduğunu", "büyük", "küçük", "iyi", "aynı",
        "bütün", "burada", "şimdi", "önce", "bizim", "sizin",
        "onlar", "onların", "benim", "senin", "neden", "niçin",
        "çünkü", "fakat", "veya", "ya", "hep", "artık", "belki",
        "tabii", "işte", "tüm", "bazı", "birçok", "nerede", "iç",
        "dış", "üst", "alt", "arasında", "hakkında", "göre", "karşı",
        "doğru", "beri", "dolayı", "rağmen", "yine", "hâlâ",
    ),
    "fi": (
        "ja", "on", "ei", "että", "joka", "oli", "mutta", "hän",
        "se", "kun", "niin", "myös", "ovat", "jos", "mikä", "sekä",
        "tai", "ole", "kuin", "siitä", "sen", "hänen", "sitä",
        "tämä", "olla", "vain", "voi", "mitä", "sillä", "jo", "he",
        "kaikki", "nyt", "sitten", "vielä", "koska", "itse", "jotka",
        "näin", "mukaan", "kanssa", "hyvin", "jonka", "siis",
        "missä", "tässä", "tämän", "siinä", "juuri", "paljon",
        "jotain", "joku", "kaksi", "ensimmäinen", "aika", "vuosi",
        "päivä", "mies", "sanoi", "sanoo", "olen", "olet", "olemme",
        "olisi", "ollut", "tulee", "tuli", "saa", "sai", "pitää",
        "täytyy", "voidaan", "sinä", "minä", "me", "te", "heidän",
        "meidän", "minun", "sinun", "hänet", "minut", "kuitenkin",
        "esimerkiksi", "jälkeen", "ennen", "yli", "alle", "noin",
        "lähes", "aivan", "ehkä", "vaikka", "koko", "oma", "uusi",
        "suuri", "hyvä", "viime", "eri", "mm", "eli", "vaan",
    ),
}


# ----------------------------------------------------- trigram profiles

TRIGRAM_ALPHA = 0.5


def _word_trigrams(word: str):
    """Boundary-padded character trigrams of one lowercase word:
    trigrams of ' ' + word + ' ' (so 2-letter words still yield
    signal and prefixes/suffixes are marked)."""
    p = f" {word} "
    return [p[i:i + 3] for i in range(len(p) - 2)]


def trigram_logprobs() -> dict:
    """Per-language character-trigram log-probability profiles DERIVED
    from the FUNCTION_WORDS inventories above (no external data): the
    closed-class words carry each orthography's signature letter
    patterns (German 'sch'/'der', Spanish 'que'/' el', Finnish
    'ää'...), which generalises to open-class words sharing the same
    orthography — the fallback signal for short or code-mixed documents
    where zero function words appear.

    -> (logp, floor): logp[lang][tri] = ln((c + a) / (total + a * V));
    floor[lang] = ln(a / (total + a * V)) for unseen trigrams, with V =
    |global trigram vocabulary| + 1 (one shared unseen slot).  Additive
    smoothing keeps every score finite; the same constants generate the
    gate oracle SQL so engine and oracle cannot drift."""
    import math

    counts: dict = {}
    vocab = set()
    for lang, words in FUNCTION_WORDS.items():
        c: dict = {}
        for w in words:
            for t in _word_trigrams(w):
                c[t] = c.get(t, 0) + 1
        counts[lang] = c
        vocab.update(c)
    V = len(vocab) + 1
    a = TRIGRAM_ALPHA
    logp: dict = {}
    floor: dict = {}
    for lang, c in counts.items():
        total = sum(c.values())
        denom = total + a * V
        logp[lang] = {t: math.log((n + a) / denom) for t, n in c.items()}
        floor[lang] = math.log(a / denom)
    return logp, floor
