"""Hand-labeled SPICE tuple gold set (VERDICT r2 item 3, option (b) leg).

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
  split ("a man riding a horse and a woman holding a dog").

BOTH extractors — the shipped morphology chunker (eval/spice.py) and the
independent lexicon+grammar oracle (eval/spice_oracle.py) — must
reproduce every gold set exactly.  Captions stay inside the oracle's
closed lexicon (its documented scope; the chunker has no lexicon).
"""
from subgc_tpu.eval.spice import parse_tuples
from subgc_tpu.eval.spice_oracle import oracle_tuples

GOLD = [
    ("a man riding a horse on the beach",
     {("man",), ("horse",), ("beach",),
      ("man", "ride", "horse"), ("horse", "on", "beach")}),
    ("two dogs running in the park",
     {("dog",), ("dog", "2"), ("park",), ("dog", "run in", "park")}),
    ("a young girl eating cake",
     {("girl",), ("girl", "young"), ("cake",), ("girl", "eat", "cake")}),
    ("a man and a woman sitting on a bench",
     {("man",), ("woman",), ("bench",),
      ("man", "sit on", "bench"), ("woman", "sit on", "bench")}),
    ("the car is red",
     {("car",), ("car", "red")}),
    ("the car is red and the bus is blue",
     {("car",), ("car", "red"), ("bus",), ("bus", "blue")}),
    ("a black cat sleeping on a wooden table",
     {("cat",), ("cat", "black"), ("table",), ("table", "wooden"),
      ("cat", "sleep on", "table")}),
    ("a group of people standing near a train",
     {("group",), ("person",), ("train",), ("group", "of", "person"),
      ("person", "stand near", "train")}),
    ("three sheep grazing in a field of grass",
     {("sheep",), ("sheep", "3"), ("field",), ("grass",),
      ("sheep", "graze in", "field"), ("field", "of", "grass")}),
    ("a dog catching a ball",
     {("dog",), ("ball",), ("dog", "catch", "ball")}),
    ("an old man walking with a child",
     {("man",), ("man", "old"), ("child",), ("man", "walk with", "child")}),
    ("a plate of food on a table",
     {("plate",), ("food",), ("table",),
      ("plate", "of", "food"), ("food", "on", "table")}),
    ("a man riding a horse and a woman holding a dog",
     {("man",), ("horse",), ("woman",), ("dog",),
      ("man", "ride", "horse"), ("woman", "hold", "dog")}),
    ("a man riding a horse and a bike",
     {("man",), ("horse",), ("bike",),
      ("man", "ride", "horse"), ("man", "ride", "bike")}),
    ("a red kite flying above the beach",
     {("kite",), ("kite", "red"), ("beach",),
      ("kite", "fly above", "beach")}),
    ("a woman holding a red umbrella",
     {("woman",), ("umbrella",), ("umbrella", "red"),
      ("woman", "hold", "umbrella")}),
    ("there is a dog sleeping on the couch",
     {("dog",), ("couch",), ("dog", "sleep on", "couch")}),
    ("a man is holding a black cat",
     {("man",), ("cat",), ("cat", "black"), ("man", "hold", "cat")}),
    ("two men playing a game",
     {("man",), ("man", "2"), ("game",), ("man", "play", "game")}),
    ("a bird flying over the ocean",
     {("bird",), ("ocean",), ("bird", "fly over", "ocean")}),
    ("a train crossing a street",
     {("train",), ("street",), ("train", "cross", "street")}),
    ("a little girl with a red kite",
     {("girl",), ("girl", "little"), ("kite",), ("kite", "red"),
      ("girl", "with", "kite")}),
    ("the kitchen is clean and bright",
     {("kitchen",), ("kitchen", "clean"), ("kitchen", "bright")}),
    ("a brown horse standing in a green field",
     {("horse",), ("horse", "brown"), ("field",), ("field", "green"),
      ("horse", "stand in", "field")}),
    ("a boy throwing a ball to a dog",
     {("boy",), ("ball",), ("dog",),
      ("boy", "throw", "ball"), ("ball", "to", "dog")}),
    ("a cat sitting under an umbrella",
     {("cat",), ("umbrella",), ("cat", "sit under", "umbrella")}),
    ("a man and a woman and a child walking on the beach",
     {("man",), ("woman",), ("child",), ("beach",),
      ("man", "walk on", "beach"), ("woman", "walk on", "beach"),
      ("child", "walk on", "beach")}),
    ("four boats in the water",
     {("boat",), ("boat", "4"), ("water",), ("boat", "in", "water")}),
    # nearest-head attachment spec: "walking" subjects the umbrella
    ("a woman carrying an umbrella walking down the street",
     {("woman",), ("umbrella",), ("street",),
      ("woman", "carry", "umbrella"),
      ("umbrella", "walk down", "street")}),
    ("a tall man standing behind a short woman",
     {("man",), ("man", "tall"), ("woman",), ("woman", "short"),
      ("man", "stand behind", "woman")}),
    ("a clock on the wall of the room",
     {("clock",), ("wall",), ("room",),
      ("clock", "on", "wall"), ("wall", "of", "room")}),
    ("an elephant and a zebra near the water",
     {("elephant",), ("zebra",), ("water",),
      ("elephant", "near", "water"), ("zebra", "near", "water")}),
    ("a happy child playing with a kite in the park",
     {("child",), ("child", "happy"), ("kite",), ("park",),
      ("child", "play with", "kite"), ("kite", "in", "park")}),
    ("the bus is big and yellow",
     {("bus",), ("bus", "big"), ("bus", "yellow")}),
    # group relation-spread spec: "of food" distributes over the conjoined
    # heads (a dependency parse would attach to the bowl alone)
    ("a sandwich and a bowl of food on a table",
     {("sandwich",), ("bowl",), ("food",), ("table",),
      ("sandwich", "of", "food"), ("bowl", "of", "food"),
      ("food", "on", "table")}),
]


def test_chunker_matches_gold():
    bad = [(cap, sorted(parse_tuples(cap)), sorted(gold))
           for cap, gold in GOLD if parse_tuples(cap) != gold]
    assert not bad, bad


def test_oracle_matches_gold():
    bad = [(cap, sorted(oracle_tuples(cap)), sorted(gold))
           for cap, gold in GOLD if oracle_tuples(cap) != gold]
    assert not bad, bad
