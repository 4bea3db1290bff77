"""Hand-labeled SPICE tuple gold set, construction-stratified (VERDICT r2
item 3 option (b); expanded to 150+ cases per VERDICT r4 item 3).

Each caption below was labeled BY HAND from the SPICE tuple definition —
objects, (object, attribute), (subject, relation, object) — under the
repo's documented extraction spec (docs/METRICS.md):

* lemma-normalized words, determiners dropped, counts surface as numeric
  attributes;
* relation phrases merge consecutive relation words ("running in" ->
  "run in");
* nearest-head attachment: a PP or participial relation takes the nearest
  preceding head as subject ("a woman carrying an umbrella walking down
  the street" subjects "walking" with UMBRELLA, where a dependency parse
  would pick the woman — the one documented divergence class vs the
  SPICE jar, misc/coco-caption/pycocoevalcap/spice/spice.py:18,72);
* "and"/"or" conjoin heads into relation groups, clause conjunctions
  split ("a man riding a horse and a woman holding a dog");
* -ing catalog words (building, painting, railing, ceiling, ...) are
  nominal unless in transitive position (followed by a determiner).

Every case carries a CONSTRUCTION CLASS so agreement can be reported per
divergence class (the per-class table lives in docs/METRICS.md):

  basic        subject -ing-verb object
  prep         NP prep NP (incl. nearest-head PP chains)
  attr         adjective stacks + attribute-bearing NPs
  copula       "X is ADJ" predicates and copula-introduced relations
  count        numeric/quantifier attributes
  conj-subj    conjoined subjects sharing a relation
  conj-obj     conjoined objects sharing a relation (+ group spread)
  conj-clause  clause-splitting conjunctions
  conj-pred    conjoined copular predicates vs new copular clauses
  attach       nearest-preceding-head attachment (participial chains)
  ing-nom      -ing catalog words in nominal position
  ing-verb     -ing catalog words in verbal (transitive) position
  expletive    expletive subjects carry no scene content
  rel-phrase   multi-word relation phrases (verb + particle/prep)
  dangling     relation with no object -> 2-tuple

BOTH extractors — the shipped morphology chunker (eval/spice.py) and the
independent lexicon+grammar oracle (eval/spice_oracle.py) — must
reproduce every gold set exactly, EXCEPT the documented ing-verb
divergence: the oracle's closed lexicon tags catalog -ing words as nouns
unconditionally ("nouns win ties"), so transitive catalog uses diverge.
Those cases are listed in ORACLE_DIVERGENT with the oracle's exact
output pinned, so drift is still caught.  Captions stay inside the
oracle's closed lexicon (its documented scope; the chunker has no
lexicon).
"""
import collections

from subgc_tpu.eval.spice import parse_tuples
from subgc_tpu.eval.spice_oracle import oracle_tuples

GOLD = [
    # ------------------------------------------------------------- basic
    ("basic", "a man riding a horse on the beach",
     {("man",), ("horse",), ("beach",),
      ("man", "ride", "horse"), ("horse", "on", "beach")}),
    ("basic", "a dog catching a ball",
     {("dog",), ("ball",), ("dog", "catch", "ball")}),
    ("basic", "a boy throwing a ball to a dog",
     {("boy",), ("ball",), ("dog",),
      ("boy", "throw", "ball"), ("ball", "to", "dog")}),
    ("basic", "a boy eating a sandwich",
     {("boy",), ("sandwich",), ("boy", "eat", "sandwich")}),
    ("basic", "a girl holding a phone",
     {("girl",), ("phone",), ("girl", "hold", "phone")}),
    ("basic", "a man driving a truck",
     {("man",), ("truck",), ("man", "drive", "truck")}),
    ("basic", "a woman watching television",
     {("woman",), ("television",), ("woman", "watch", "television")}),
    ("basic", "a dog catching a kite",
     {("dog",), ("kite",), ("dog", "catch", "kite")}),
    ("basic", "a bear eating fruit",
     {("bear",), ("fruit",), ("bear", "eat", "fruit")}),
    ("basic", "a player throwing a ball",
     {("player",), ("ball",), ("player", "throw", "ball")}),
    ("basic", "a kitten watching a bird",
     {("kitten",), ("bird",), ("kitten", "watch", "bird")}),
    ("basic", "a child riding a bike",
     {("child",), ("bike",), ("child", "ride", "bike")}),
    ("basic", "a cow eating grass",
     {("cow",), ("grass",), ("cow", "eat", "grass")}),
    # -------------------------------------------------------------- prep
    ("prep", "a group of people standing near a train",
     {("group",), ("person",), ("train",), ("group", "of", "person"),
      ("person", "stand near", "train")}),
    ("prep", "a plate of food on a table",
     {("plate",), ("food",), ("table",),
      ("plate", "of", "food"), ("food", "on", "table")}),
    ("prep", "a clock on the wall of the room",
     {("clock",), ("wall",), ("room",),
      ("clock", "on", "wall"), ("wall", "of", "room")}),
    ("prep", "a cup on a table",
     {("cup",), ("table",), ("cup", "on", "table")}),
    ("prep", "a laptop on a bed",
     {("laptop",), ("bed",), ("laptop", "on", "bed")}),
    ("prep", "a bottle of water on the floor",
     {("bottle",), ("water",), ("floor",),
      ("bottle", "of", "water"), ("water", "on", "floor")}),
    ("prep", "a vase on a table in the kitchen",
     {("vase",), ("table",), ("kitchen",),
      ("vase", "on", "table"), ("table", "in", "kitchen")}),
    ("prep", "a book on a chair near the window",
     {("book",), ("chair",), ("window",),
      ("book", "on", "chair"), ("chair", "near", "window")}),
    ("prep", "a sign above the door",
     {("sign",), ("door",), ("sign", "above", "door")}),
    ("prep", "a train at the station",
     {("train",), ("station",), ("train", "at", "station")}),
    ("prep", "a plane on the runway at the airport",
     {("plane",), ("runway",), ("airport",),
      ("plane", "on", "runway"), ("runway", "at", "airport")}),
    ("prep", "a bird between a tree and a building",
     {("bird",), ("tree",), ("building",),
      ("bird", "between", "tree"), ("bird", "between", "building")}),
    ("prep", "a crowd of people at a game",
     {("crowd",), ("person",), ("game",),
      ("crowd", "of", "person"), ("person", "at", "game")}),
    ("prep", "a mouse under the couch",
     {("mouse",), ("couch",), ("mouse", "under", "couch")}),
    ("prep", "snow on the mountain",
     {("snow",), ("mountain",), ("snow", "on", "mountain")}),
    # -------------------------------------------------------------- attr
    ("attr", "a young girl eating cake",
     {("girl",), ("girl", "young"), ("cake",), ("girl", "eat", "cake")}),
    ("attr", "a black cat sleeping on a wooden table",
     {("cat",), ("cat", "black"), ("table",), ("table", "wooden"),
      ("cat", "sleep on", "table")}),
    ("attr", "an old man walking with a child",
     {("man",), ("man", "old"), ("child",), ("man", "walk with", "child")}),
    ("attr", "a red kite flying above the beach",
     {("kite",), ("kite", "red"), ("beach",),
      ("kite", "fly above", "beach")}),
    ("attr", "a woman holding a red umbrella",
     {("woman",), ("umbrella",), ("umbrella", "red"),
      ("woman", "hold", "umbrella")}),
    ("attr", "a little girl with a red kite",
     {("girl",), ("girl", "little"), ("kite",), ("kite", "red"),
      ("girl", "with", "kite")}),
    ("attr", "a brown horse standing in a green field",
     {("horse",), ("horse", "brown"), ("field",), ("field", "green"),
      ("horse", "stand in", "field")}),
    ("attr", "a tall man standing behind a short woman",
     {("man",), ("man", "tall"), ("woman",), ("woman", "short"),
      ("man", "stand behind", "woman")}),
    ("attr", "a happy child playing with a kite in the park",
     {("child",), ("child", "happy"), ("kite",), ("park",),
      ("child", "play with", "kite"), ("kite", "in", "park")}),
    ("attr", "a small white dog",
     {("dog",), ("dog", "small"), ("dog", "white")}),
    ("attr", "a big yellow bus on the street",
     {("bus",), ("bus", "big"), ("bus", "yellow"), ("street",),
      ("bus", "on", "street")}),
    ("attr", "an old wooden bench in the park",
     {("bench",), ("bench", "old"), ("bench", "wooden"), ("park",),
      ("bench", "in", "park")}),
    ("attr", "a dirty white truck",
     {("truck",), ("truck", "dirty"), ("truck", "white")}),
    ("attr", "a beautiful young woman holding a pretty vase",
     {("woman",), ("woman", "beautiful"), ("woman", "young"),
      ("vase",), ("vase", "pretty"), ("woman", "hold", "vase")}),
    ("attr", "a fluffy white cat sleeping on a warm bed",
     {("cat",), ("cat", "fluffy"), ("cat", "white"), ("bed",),
      ("bed", "warm"), ("cat", "sleep on", "bed")}),
    ("attr", "a tall green tree near a small house",
     {("tree",), ("tree", "tall"), ("tree", "green"), ("house",),
      ("house", "small"), ("tree", "near", "house")}),
    ("attr", "a modern kitchen with a clean floor",
     {("kitchen",), ("kitchen", "modern"), ("floor",), ("floor", "clean"),
      ("kitchen", "with", "floor")}),
    ("attr", "a little puppy playing with a big ball",
     {("puppy",), ("puppy", "little"), ("ball",), ("ball", "big"),
      ("puppy", "play with", "ball")}),
    ("attr", "a dark blue boat in the cold water",
     {("boat",), ("boat", "dark"), ("boat", "blue"), ("water",),
      ("water", "cold"), ("boat", "in", "water")}),
    ("attr", "a shiny new car on the wet road",
     {("car",), ("car", "shiny"), ("car", "new"), ("road",),
      ("road", "wet"), ("car", "on", "road")}),
    ("attr", "a quiet old man sitting on a wooden chair",
     {("man",), ("man", "quiet"), ("man", "old"), ("chair",),
      ("chair", "wooden"), ("man", "sit on", "chair")}),
    # ------------------------------------------------------------ copula
    ("copula", "the car is red",
     {("car",), ("car", "red")}),
    ("copula", "a man is holding a black cat",
     {("man",), ("cat",), ("cat", "black"), ("man", "hold", "cat")}),
    ("copula", "the dog is happy",
     {("dog",), ("dog", "happy")}),
    ("copula", "the water is cold",
     {("water",), ("water", "cold")}),
    ("copula", "the street was busy",
     {("street",), ("street", "busy")}),
    ("copula", "the windows are open",
     {("window",), ("window", "open")}),
    ("copula", "the little girl is happy",
     {("girl",), ("girl", "little"), ("girl", "happy")}),
    ("copula", "the man is walking down the street",
     {("man",), ("street",), ("man", "walk down", "street")}),
    ("copula", "the birds are flying over the ocean",
     {("bird",), ("ocean",), ("bird", "fly over", "ocean")}),
    ("copula", "the cat was sleeping under the table",
     {("cat",), ("table",), ("cat", "sleep under", "table")}),
    # ------------------------------------------------------------- count
    ("count", "two dogs running in the park",
     {("dog",), ("dog", "2"), ("park",), ("dog", "run in", "park")}),
    ("count", "three sheep grazing in a field of grass",
     {("sheep",), ("sheep", "3"), ("field",), ("grass",),
      ("sheep", "graze in", "field"), ("field", "of", "grass")}),
    ("count", "two men playing a game",
     {("man",), ("man", "2"), ("game",), ("man", "play", "game")}),
    ("count", "four boats in the water",
     {("boat",), ("boat", "4"), ("water",), ("boat", "in", "water")}),
    ("count", "three dogs in the snow",
     {("dog",), ("dog", "3"), ("snow",), ("dog", "in", "snow")}),
    ("count", "five birds flying over the water",
     {("bird",), ("bird", "5"), ("water",), ("bird", "fly over", "water")}),
    ("count", "two young girls eating cake",
     {("girl",), ("girl", "2"), ("girl", "young"), ("cake",),
      ("girl", "eat", "cake")}),
    ("count", "four chairs around a table",
     {("chair",), ("chair", "4"), ("table",),
      ("chair", "around", "table")}),
    ("count", "one man standing on a mountain",
     {("man",), ("man", "1"), ("mountain",),
      ("man", "stand on", "mountain")}),
    ("count", "many people walking across the street",
     {("person",), ("person", "many"), ("street",),
      ("person", "walk across", "street")}),
    ("count", "several boats on the ocean",
     {("boat",), ("boat", "several"), ("ocean",),
      ("boat", "on", "ocean")}),
    ("count", "two cats and three dogs",
     {("cat",), ("cat", "2"), ("dog",), ("dog", "3")}),
    ("count", "three men holding two bats",
     {("man",), ("man", "3"), ("bat",), ("bat", "2"),
      ("man", "hold", "bat")}),
    ("count", "five sheep in a green field",
     {("sheep",), ("sheep", "5"), ("field",), ("field", "green"),
      ("sheep", "in", "field")}),
    # --------------------------------------------------------- conj-subj
    ("conj-subj", "a man and a woman sitting on a bench",
     {("man",), ("woman",), ("bench",),
      ("man", "sit on", "bench"), ("woman", "sit on", "bench")}),
    ("conj-subj", "a man and a woman and a child walking on the beach",
     {("man",), ("woman",), ("child",), ("beach",),
      ("man", "walk on", "beach"), ("woman", "walk on", "beach"),
      ("child", "walk on", "beach")}),
    ("conj-subj", "an elephant and a zebra near the water",
     {("elephant",), ("zebra",), ("water",),
      ("elephant", "near", "water"), ("zebra", "near", "water")}),
    ("conj-subj", "a cat and a dog sleeping on the couch",
     {("cat",), ("dog",), ("couch",),
      ("cat", "sleep on", "couch"), ("dog", "sleep on", "couch")}),
    ("conj-subj", "a boy and a girl playing a game",
     {("boy",), ("girl",), ("game",),
      ("boy", "play", "game"), ("girl", "play", "game")}),
    ("conj-subj", "a man and a child walking to the park",
     {("man",), ("child",), ("park",),
      ("man", "walk to", "park"), ("child", "walk to", "park")}),
    ("conj-subj", "a horse and a cow grazing in a field",
     {("horse",), ("cow",), ("field",),
      ("horse", "graze in", "field"), ("cow", "graze in", "field")}),
    ("conj-subj", "an elephant and a giraffe standing near a tree",
     {("elephant",), ("giraffe",), ("tree",),
      ("elephant", "stand near", "tree"),
      ("giraffe", "stand near", "tree")}),
    ("conj-subj", "two dogs and a cat running in the park",
     {("dog",), ("dog", "2"), ("cat",), ("park",),
      ("dog", "run in", "park"), ("cat", "run in", "park")}),
    ("conj-subj", "a cat or a dog under the bed",
     {("cat",), ("dog",), ("bed",),
      ("cat", "under", "bed"), ("dog", "under", "bed")}),
    ("conj-subj", "a man and a woman sitting at a table",
     {("man",), ("woman",), ("table",),
      ("man", "sit at", "table"), ("woman", "sit at", "table")}),
    # ---------------------------------------------------------- conj-obj
    ("conj-obj", "a man riding a horse and a bike",
     {("man",), ("horse",), ("bike",),
      ("man", "ride", "horse"), ("man", "ride", "bike")}),
    # group relation-spread spec: "of food" distributes over the conjoined
    # heads (a dependency parse would attach to the bowl alone)
    ("conj-obj", "a sandwich and a bowl of food on a table",
     {("sandwich",), ("bowl",), ("food",), ("table",),
      ("sandwich", "of", "food"), ("bowl", "of", "food"),
      ("food", "on", "table")}),
    ("conj-obj", "a man holding a red kite and a blue ball",
     {("man",), ("kite",), ("kite", "red"), ("ball",), ("ball", "blue"),
      ("man", "hold", "kite"), ("man", "hold", "ball")}),
    ("conj-obj", "a woman eating a sandwich and a cake",
     {("woman",), ("sandwich",), ("cake",),
      ("woman", "eat", "sandwich"), ("woman", "eat", "cake")}),
    ("conj-obj", "a girl with a dog and a cat",
     {("girl",), ("dog",), ("cat",),
      ("girl", "with", "dog"), ("girl", "with", "cat")}),
    ("conj-obj", "a boy throwing a ball and a kite",
     {("boy",), ("ball",), ("kite",),
      ("boy", "throw", "ball"), ("boy", "throw", "kite")}),
    ("conj-obj", "a bowl of apples and bananas",
     {("bowl",), ("apple",), ("banana",),
      ("bowl", "of", "apple"), ("bowl", "of", "banana")}),
    # conjoined objects also share the FOLLOWING relation (group spread)
    ("conj-obj", "a man riding a horse and a bike on the beach",
     {("man",), ("horse",), ("bike",), ("beach",),
      ("man", "ride", "horse"), ("man", "ride", "bike"),
      ("horse", "on", "beach"), ("bike", "on", "beach")}),
    ("conj-obj", "a plate of food and fruit on a table",
     {("plate",), ("food",), ("fruit",), ("table",),
      ("plate", "of", "food"), ("plate", "of", "fruit"),
      ("food", "on", "table"), ("fruit", "on", "table")}),
    ("conj-obj", "a kitten playing with a ball and a mouse",
     {("kitten",), ("ball",), ("mouse",),
      ("kitten", "play with", "ball"), ("kitten", "play with", "mouse")}),
    # ------------------------------------------------------- conj-clause
    ("conj-clause", "a man riding a horse and a woman holding a dog",
     {("man",), ("horse",), ("woman",), ("dog",),
      ("man", "ride", "horse"), ("woman", "hold", "dog")}),
    ("conj-clause", "a man eating a sandwich and a woman holding a cup",
     {("man",), ("sandwich",), ("woman",), ("cup",),
      ("man", "eat", "sandwich"), ("woman", "hold", "cup")}),
    ("conj-clause",
     "a dog sleeping on a couch and a cat sitting on a chair",
     {("dog",), ("couch",), ("cat",), ("chair",),
      ("dog", "sleep on", "couch"), ("cat", "sit on", "chair")}),
    ("conj-clause", "a boy riding a bike and a girl walking a dog",
     {("boy",), ("bike",), ("girl",), ("dog",),
      ("boy", "ride", "bike"), ("girl", "walk", "dog")}),
    ("conj-clause", "a man driving a truck and a woman riding a horse",
     {("man",), ("truck",), ("woman",), ("horse",),
      ("man", "drive", "truck"), ("woman", "ride", "horse")}),
    ("conj-clause", "the car is red and the man is old",
     {("car",), ("car", "red"), ("man",), ("man", "old")}),
    ("conj-clause",
     "a horse grazing in a field and a dog running on the road",
     {("horse",), ("field",), ("dog",), ("road",),
      ("horse", "graze in", "field"), ("dog", "run on", "road")}),
    ("conj-clause", "two men playing a game and a woman watching",
     {("man",), ("man", "2"), ("game",), ("woman",),
      ("man", "play", "game"), ("woman", "watch")}),
    ("conj-clause",
     "a man surfing on the ocean and a boy swimming in the water",
     {("man",), ("ocean",), ("boy",), ("water",),
      ("man", "surf on", "ocean"), ("boy", "swim in", "water")}),
    # --------------------------------------------------------- conj-pred
    ("conj-pred", "the car is red and the bus is blue",
     {("car",), ("car", "red"), ("bus",), ("bus", "blue")}),
    ("conj-pred", "the kitchen is clean and bright",
     {("kitchen",), ("kitchen", "clean"), ("kitchen", "bright")}),
    ("conj-pred", "the bus is big and yellow",
     {("bus",), ("bus", "big"), ("bus", "yellow")}),
    ("conj-pred", "the dog is small and fluffy",
     {("dog",), ("dog", "small"), ("dog", "fluffy")}),
    ("conj-pred", "the house is big and white and modern",
     {("house",), ("house", "big"), ("house", "white"),
      ("house", "modern")}),
    ("conj-pred", "the cat is black and the dog is white",
     {("cat",), ("cat", "black"), ("dog",), ("dog", "white")}),
    ("conj-pred", "the kitchen was clean and quiet",
     {("kitchen",), ("kitchen", "clean"), ("kitchen", "quiet")}),
    ("conj-pred", "the sky is dark and the water is cold",
     {("sky",), ("sky", "dark"), ("water",), ("water", "cold")}),
    ("conj-pred", "the banana is yellow and the apple is red",
     {("banana",), ("banana", "yellow"), ("apple",), ("apple", "red")}),
    # ------------------------------------------------------------ attach
    # nearest-head attachment spec: "walking" subjects the umbrella
    ("attach", "a woman carrying an umbrella walking down the street",
     {("woman",), ("umbrella",), ("street",),
      ("woman", "carry", "umbrella"),
      ("umbrella", "walk down", "street")}),
    ("attach", "a man wearing a glove holding a bat",
     {("man",), ("glove",), ("bat",),
      ("man", "wear", "glove"), ("glove", "hold", "bat")}),
    ("attach", "a dog on a couch watching television",
     {("dog",), ("couch",), ("television",),
      ("dog", "on", "couch"), ("couch", "watch", "television")}),
    ("attach", "a girl with a kite running on the beach",
     {("girl",), ("kite",), ("beach",),
      ("girl", "with", "kite"), ("kite", "run on", "beach")}),
    ("attach", "a woman holding a cup sitting on a bench",
     {("woman",), ("cup",), ("bench",),
      ("woman", "hold", "cup"), ("cup", "sit on", "bench")}),
    ("attach", "a boy eating a sandwich walking down the road",
     {("boy",), ("sandwich",), ("road",),
      ("boy", "eat", "sandwich"), ("sandwich", "walk down", "road")}),
    ("attach", "a man riding a horse carrying a child",
     {("man",), ("horse",), ("child",),
      ("man", "ride", "horse"), ("horse", "carry", "child")}),
    ("attach", "a bird on a tree looking at a cat",
     {("bird",), ("tree",), ("cat",),
      ("bird", "on", "tree"), ("tree", "look at", "cat")}),
    ("attach", "a child holding a ball standing near a door",
     {("child",), ("ball",), ("door",),
      ("child", "hold", "ball"), ("ball", "stand near", "door")}),
    ("attach", "a cat under a table eating food",
     {("cat",), ("table",), ("food",),
      ("cat", "under", "table"), ("table", "eat", "food")}),
    ("attach", "a woman in a kitchen holding a plate",
     {("woman",), ("kitchen",), ("plate",),
      ("woman", "in", "kitchen"), ("kitchen", "hold", "plate")}),
    # ----------------------------------------------------------- ing-nom
    ("ing-nom", "a painting on the wall",
     {("painting",), ("wall",), ("painting", "on", "wall")}),
    ("ing-nom", "a tall building near the water",
     {("building",), ("building", "tall"), ("water",),
      ("building", "near", "water")}),
    ("ing-nom", "a cat on the railing",
     {("cat",), ("railing",), ("cat", "on", "railing")}),
    ("ing-nom", "a light on the ceiling",
     {("light",), ("ceiling",), ("light", "on", "ceiling")}),
    # nearest-head: the horse (not the painting) is in the bedroom
    ("ing-nom", "a painting of a horse in the bedroom",
     {("painting",), ("horse",), ("bedroom",),
      ("painting", "of", "horse"), ("horse", "in", "bedroom")}),
    ("ing-nom", "an old building with a red door",
     {("building",), ("building", "old"), ("door",), ("door", "red"),
      ("building", "with", "door")}),
    ("ing-nom", "a bird sitting on a railing",
     {("bird",), ("railing",), ("bird", "sit on", "railing")}),
    ("ing-nom", "a beautiful painting above the couch",
     {("painting",), ("painting", "beautiful"), ("couch",),
      ("painting", "above", "couch")}),
    # a catalog -ing word NOT followed by a determiner stays nominal:
    # "a woman painting" is the NP reading (head painting, modifier woman)
    ("ing-nom", "a woman painting",
     {("painting",), ("painting", "woman")}),
    # ---------------------------------------------------------- ing-verb
    ("ing-verb", "a train crossing a street",
     {("train",), ("street",), ("train", "cross", "street")}),
    ("ing-verb", "a man crossing the road",
     {("man",), ("road",), ("man", "cross", "road")}),
    # transitive position (next word a determiner) marks verbal use of a
    # catalog word; the lexicon oracle's nouns-win tagging diverges here
    # (pinned in ORACLE_DIVERGENT)
    ("ing-verb", "a man painting a wall",
     {("man",), ("wall",), ("man", "paint", "wall")}),
    ("ing-verb", "a woman building a house",
     {("woman",), ("house",), ("woman", "build", "house")}),
    ("ing-verb", "a dog crossing a street near a car",
     {("dog",), ("street",), ("car",),
      ("dog", "cross", "street"), ("street", "near", "car")}),
    ("ing-verb", "two people crossing the road",
     {("person",), ("person", "2"), ("road",),
      ("person", "cross", "road")}),
    # --------------------------------------------------------- expletive
    ("expletive", "there is a dog sleeping on the couch",
     {("dog",), ("couch",), ("dog", "sleep on", "couch")}),
    ("expletive", "there is a cat under the table",
     {("cat",), ("table",), ("cat", "under", "table")}),
    ("expletive", "there are two dogs in the park",
     {("dog",), ("dog", "2"), ("park",), ("dog", "in", "park")}),
    ("expletive", "there is a red car on the street",
     {("car",), ("car", "red"), ("street",), ("car", "on", "street")}),
    ("expletive", "there is a painting on the wall of the bathroom",
     {("painting",), ("wall",), ("bathroom",),
      ("painting", "on", "wall"), ("wall", "of", "bathroom")}),
    ("expletive", "there are many people at the station",
     {("person",), ("person", "many"), ("station",),
      ("person", "at", "station")}),
    ("expletive", "there is a big tree behind the house",
     {("tree",), ("tree", "big"), ("house",),
      ("tree", "behind", "house")}),
    ("expletive", "there are three birds on the railing",
     {("bird",), ("bird", "3"), ("railing",),
      ("bird", "on", "railing")}),
    ("expletive", "there is an old clock above the door",
     {("clock",), ("clock", "old"), ("door",),
      ("clock", "above", "door")}),
    # -------------------------------------------------------- rel-phrase
    ("rel-phrase", "a bird flying over the ocean",
     {("bird",), ("ocean",), ("bird", "fly over", "ocean")}),
    ("rel-phrase", "a cat sitting under an umbrella",
     {("cat",), ("umbrella",), ("cat", "sit under", "umbrella")}),
    ("rel-phrase", "a cat looking at a bird",
     {("cat",), ("bird",), ("cat", "look at", "bird")}),
    ("rel-phrase", "a dog jumping over a bench",
     {("dog",), ("bench",), ("dog", "jump over", "bench")}),
    ("rel-phrase", "a man walking into the house",
     {("man",), ("house",), ("man", "walk into", "house")}),
    ("rel-phrase", "a girl running through the field",
     {("girl",), ("field",), ("girl", "run through", "field")}),
    ("rel-phrase", "a horse walking along the road",
     {("horse",), ("road",), ("horse", "walk along", "road")}),
    ("rel-phrase", "a boy jumping into the water",
     {("boy",), ("water",), ("boy", "jump into", "water")}),
    ("rel-phrase", "a truck driving down the road",
     {("truck",), ("road",), ("truck", "drive down", "road")}),
    ("rel-phrase", "a bird flying around the building",
     {("bird",), ("building",), ("bird", "fly around", "building")}),
    ("rel-phrase", "a man looking through the window",
     {("man",), ("window",), ("man", "look through", "window")}),
    ("rel-phrase", "a sheep walking up the mountain",
     {("sheep",), ("mountain",), ("sheep", "walk up", "mountain")}),
    # ---------------------------------------------------------- dangling
    ("dangling", "a dog running",
     {("dog",), ("dog", "run")}),
    ("dangling", "two men talking",
     {("man",), ("man", "2"), ("man", "talk")}),
    ("dangling", "a young woman smiling",
     {("woman",), ("woman", "young"), ("woman", "smile")}),
    ("dangling", "a kitten sleeping",
     {("kitten",), ("kitten", "sleep")}),
    ("dangling", "three children playing",
     {("child",), ("child", "3"), ("child", "play")}),
]

# The documented ing-verb divergence: the oracle's closed lexicon tags
# catalog -ing words (building, painting, ...) as NOUNS unconditionally
# ("nouns win ties", eval/spice_oracle.py::_tag), so transitive catalog
# uses parse as one NP instead of a relation.  The oracle's exact output
# is pinned so drift is still caught; the shipped chunker (the scorer
# users run) matches the gold reading via its transitive-position cue.
ORACLE_DIVERGENT = {
    "a man painting a wall":
        {("wall",), ("wall", "man"), ("wall", "painting")},
    "a woman building a house":
        {("house",), ("house", "woman"), ("house", "building")},
}


def test_gold_is_stratified_and_large():
    by_cls = collections.Counter(cls for cls, _, _ in GOLD)
    assert len(GOLD) >= 150, len(GOLD)
    # every documented divergence class is covered with real depth
    for cls, n_min in [("attach", 10), ("conj-subj", 10), ("conj-obj", 10),
                       ("conj-clause", 8), ("conj-pred", 8),
                       ("ing-nom", 8), ("ing-verb", 5), ("count", 12),
                       ("expletive", 8), ("rel-phrase", 10),
                       ("copula", 8), ("dangling", 5)]:
        assert by_cls[cls] >= n_min, (cls, by_cls[cls])
    # no duplicate captions
    caps = [c for _, c, _ in GOLD]
    assert len(caps) == len(set(caps))


def test_chunker_matches_gold():
    bad = [(cls, cap, sorted(parse_tuples(cap)), sorted(gold))
           for cls, cap, gold in GOLD if parse_tuples(cap) != gold]
    assert not bad, bad


def test_oracle_matches_gold():
    bad = []
    for cls, cap, gold in GOLD:
        expect = ORACLE_DIVERGENT.get(cap, gold)
        got = oracle_tuples(cap)
        if got != expect:
            bad.append((cls, cap, sorted(got), sorted(expect)))
    assert not bad, bad


def test_per_class_agreement_pinned():
    """Per-construction oracle-vs-gold agreement (the docs/METRICS.md
    table): 100% everywhere except the documented ing-verb divergence."""
    agree = collections.Counter()
    total = collections.Counter()
    for cls, cap, gold in GOLD:
        total[cls] += 1
        agree[cls] += oracle_tuples(cap) == gold
    for cls in total:
        if cls == "ing-verb":
            continue
        assert agree[cls] == total[cls], (cls, agree[cls], total[cls])
    assert agree["ing-verb"] == total["ing-verb"] - len(ORACLE_DIVERGENT)
