"""Lemmatizer breadth vs a Flickr30k-Entities-style vocabulary (VERDICT r1
missing item 4).

The grounding eval lemmatizes detection class names and caption tokens
(`misc/grounding/eval_grd_flickr30k_entities.py:124-126,164`, via a CoreNLP
server that is an external download).  This pins the rule lemmatizer's
output on ~200 words representative of the Flickr30k-Entities / Visual
Genome class list (visual object nouns, often plural) and the caption-token
vocabulary (incl. verb inflections), with hand-expected lemmas.
"""
from subgc_tpu.utils.lemma import lemmatize

# word -> expected lemma; identity entries assert NON-stripping
CASES = {
    # regular noun plurals (typical VG/Flickr30k class names)
    "dogs": "dog", "cats": "cat", "horses": "horse", "cars": "car",
    "tables": "table", "chairs": "chair", "boats": "boat", "trees": "tree",
    "birds": "bird", "bikes": "bike", "helmets": "helmet", "shirts": "shirt",
    "jackets": "jacket", "umbrellas": "umbrella", "giraffes": "giraffe",
    "zebras": "zebra", "elephants": "elephant", "plates": "plate",
    "bottles": "bottle", "flowers": "flower", "buildings": "building",
    "windows": "window", "players": "player", "houses": "house",
    "vases": "vase", "planes": "plane", "trains": "train",
    "trucks": "truck", "signs": "sign", "lights": "light",
    "kites": "kite", "surfboards": "surfboard", "skateboards": "skateboard",
    "rackets": "racket", "gloves": "glove", "shoes": "shoe", "toes": "toe",
    "canoes": "canoe", "taxis": "taxi", "skis": "ski", "pizzas": "pizza",
    "donuts": "donut", "cakes": "cake", "bowls": "bowl", "cups": "cup",
    "laptops": "laptop", "phones": "phone", "clocks": "clock",
    "towels": "towel", "pillows": "pillow", "blankets": "blanket",
    "curtains": "curtain", "cabinets": "cabinet", "counters": "counter",
    "fields": "field", "mountains": "mountain", "waves": "wave",
    "rocks": "rock", "fences": "fence", "bridges": "bridge",
    "streets": "street", "sidewalks": "sidewalk", "tracks": "track",
    "statues": "statue", "balloons": "balloon", "candles": "candle",
    "flags": "flag", "bags": "bag", "baskets": "basket",
    # -ies plurals
    "puppies": "puppy", "babies": "baby", "ponies": "pony",
    "pastries": "pastry", "berries": "berry", "cherries": "cherry",
    "bodies": "body", "ladies": "lady", "daisies": "daisy",
    "trolleys": "trolley", "jerseys": "jersey", "monkeys": "monkey",
    "donkeys": "donkey", "keys": "key", "valleys": "valley",
    # -es after sibilants
    "benches": "bench", "couches": "couch", "peaches": "peach",
    "sandwiches": "sandwich", "watches": "watch", "dishes": "dish",
    "bushes": "bush", "brushes": "brush", "boxes": "box", "foxes": "fox",
    "glasses": "glass", "dresses": "dress", "buses": "bus",
    # -f/-fe and -oes irregulars
    "wolves": "wolf", "knives": "knife", "leaves": "leaf",
    "shelves": "shelf", "scarves": "scarf", "calves": "calf",
    "hooves": "hoof", "potatoes": "potato", "tomatoes": "tomato",
    # irregular nouns
    "men": "man", "women": "woman", "children": "child",
    "people": "person", "feet": "foot", "teeth": "tooth", "geese": "goose",
    # invariant (no stripping)
    "sheep": "sheep", "deer": "deer", "fish": "fish", "grass": "grass",
    "jeans": "jeans", "pants": "pants", "shorts": "shorts",
    "sunglasses": "sunglasses", "scissors": "scissors", "bus": "bus",
    "tennis": "tennis", "octopus": "octopus", "cactus": "cactus",
    "lens": "lens", "dress": "dress", "chess": "chess",
    # -ing nouns that must NOT strip (real VG classes)
    "ceiling": "ceiling", "building": "building", "painting": "painting",
    "railing": "railing", "awning": "awning", "clothing": "clothing",
    "frosting": "frosting", "earring": "earring", "wing": "wing",
    "ring": "ring", "swing": "swing", "string": "string",
    # verb -ing forms (caption exclude-list path)
    "riding": "ride", "walking": "walk", "holding": "hold",
    "wearing": "wear", "playing": "play", "eating": "eat",
    "driving": "drive", "skating": "skate", "surfing": "surf",
    "smiling": "smile", "jumping": "jump", "looking": "look",
    "carrying": "carry", "talking": "talk", "laughing": "laugh",
    "drinking": "drink", "reading": "read", "flying": "fly",
    "swimming": "swim", "climbing": "climb", "throwing": "throw",
    "catching": "catch", "skiing": "ski", "cooking": "cook",
    "sleeping": "sleep", "waving": "wave", "pointing": "point",
    "dancing": "dance", "singing": "sing", "posing": "pose",
    "running": "run", "sitting": "sit", "standing": "stand",
    "juggling": "juggle", "paddling": "paddle", "hiking": "hike",
    "biking": "bike", "baking": "bake", "racing": "race",
    "pulling": "pull", "pushing": "push", "kicking": "kick",
    # verb -ed forms
    "parked": "park", "dressed": "dress", "stopped": "stop",
    "covered": "cover", "painted": "paint",
    # known limitation, pinned: generic -ed cannot restore a silent e
    # for stems outside the table (CoreNLP would give "decorate")
    "decorated": "decorat",
    "smiled": "smile", "raced": "race", "carried": "carry",
    "played": "play", "jumped": "jump",
    # irregular verbs
    "was": "be", "were": "be", "is": "be", "are": "be", "been": "be",
    "has": "have", "had": "have", "ran": "run", "sat": "sit",
    "stood": "stand", "held": "hold", "ate": "eat", "went": "go",
    "rode": "ride", "drove": "drive", "threw": "throw", "caught": "catch",
    "flew": "fly", "wore": "wear", "took": "take", "lying": "lie",
}


def test_lemma_breadth():
    bad = {w: (lemmatize(w), want) for w, want in CASES.items()
           if lemmatize(w) != want}
    assert not bad, f"{len(bad)} mismatches: {bad}"


def test_class_name_self_consistency():
    """Singular class names must be fixed points (lemma(lemma(w)) stable) —
    the grounding eval compares lemma(class) against lemmas of caption
    tokens, so singular classes must not get mangled."""
    singulars = [want for want in set(CASES.values())]
    for w in singulars:
        assert lemmatize(lemmatize(w)) == lemmatize(w), w
